"""IP / CIDR column functions (the AQL ``INCIDR`` surface, SURVEY §2 A8).

The reference declares CIDR tests inside AQL strings executed by QRadar
(reference ``qradar/input/queries.json:2-3`` — ``INCIDR('10.0.0.0/8', sourceip)``
etc.).  Here they are native Column expressions — pure integer arithmetic that
stays inside Catalyst/whole-stage-codegen, no Python UDF in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_MAX_IP = 0xFFFFFFFF


def ip_to_long(ip: Column | str) -> Column:
    """Dotted-quad IPv4 string → int64 (JVM-side, codegen-friendly).

    Malformed / non-IPv4 input yields NULL (the reference validates IPv4 with
    ``ipaddress.IPv4Address`` and stringifies, ``clickhouse/helpers.py:122-128``;
    NULL-on-bad-input is the relational analog).
    """
    c = F.col(ip) if isinstance(ip, str) else ip
    valid = c.rlike(r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$")
    parts = F.split(c, r"\.")
    octets = [F.element_at(parts, i).cast("long") for i in (1, 2, 3, 4)]
    in_range = None
    for o in octets:
        cond = o <= 255
        in_range = cond if in_range is None else (in_range & cond)
    as_long = (
        octets[0] * F.lit(16777216)
        + octets[1] * F.lit(65536)
        + octets[2] * F.lit(256)
        + octets[3]
    )
    return F.when(valid & in_range, as_long).otherwise(F.lit(None).cast("long"))


def long_to_ip(n: Column | str) -> Column:
    """int64 → dotted-quad IPv4 string."""
    c = F.col(n) if isinstance(n, str) else n
    return F.concat_ws(
        ".",
        (c / 16777216).cast("long") % 256,
        (c / 65536).cast("long") % 256,
        (c / 256).cast("long") % 256,
        c % 256,
    )


def _parse_cidr(cidr: str) -> tuple[int, int]:
    """'a.b.c.d/len' → (network_long, mask_long). Python-side constant folding."""
    net, _, plen_s = cidr.partition("/")
    plen = int(plen_s) if plen_s else 32
    if not 0 <= plen <= 32:
        raise ValueError(f"bad prefix length in CIDR {cidr!r}")
    o = [int(x) for x in net.split(".")]
    if len(o) != 4 or any(not 0 <= x <= 255 for x in o):
        raise ValueError(f"bad IPv4 network in CIDR {cidr!r}")
    net_long = (o[0] << 24) | (o[1] << 16) | (o[2] << 8) | o[3]
    mask = (_MAX_IP << (32 - plen)) & _MAX_IP if plen else 0
    return net_long & mask, mask


def incidr(cidr: str, ip: Column | str) -> Column:
    """AQL ``INCIDR(cidr, ip)``: True iff ``ip`` is inside the literal CIDR block.

    The mask compare is folded to two int64 constants at plan-build time, so the
    runtime cost is one AND + one equality per row inside codegen.
    NULL (malformed) IPs test False, matching predicate semantics.
    """
    net_long, mask = _parse_cidr(cidr)
    c = F.col(ip) if isinstance(ip, str) else ip
    return F.coalesce(
        ip_to_long(c).bitwiseAND(F.lit(mask)) == F.lit(net_long),
        F.lit(False),
    )


def cidr_bounds(cidr_col: Column, plen_col: Column) -> tuple[Column, Column]:
    """(low, high) int64 bounds of a *column* of CIDR network strings.

    Used by the longest-prefix-match network decode (SURVEY §2 A11) where the CIDR
    is data, not a literal: ``low = net & mask``, ``high = low + 2^(32-plen) - 1``.
    """
    # 2^(32-plen) via pow: exact in double up to 2^52, and shiftleft's bit-count
    # argument must be a Python literal, not a Column.
    size = F.pow(F.lit(2.0), (F.lit(32) - plen_col).cast("double")).cast("long")
    mask = F.lit(_MAX_IP + 1) - size
    low = ip_to_long(cidr_col).bitwiseAND(mask)
    high = low + size - F.lit(1)
    return low, high
