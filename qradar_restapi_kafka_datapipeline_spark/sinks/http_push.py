"""HTTP push-streaming sink (SURVEY §2 B13 — the Druid/Imply path).

The reference gzips a JSON payload (level 9) and POSTs it to
``/{project}/events/{endpoint}`` with Basic auth, mapping 4xx/5xx to typed
exceptions (reference ``druid/push_streaming.py:22-82``).  Here the same wire
behavior rides ``foreachBatch``: each micro-batch serializes driver-side-free
(``toJSON`` on executors → collected per batch partition-bounded), compresses,
and POSTs via a pluggable transport — so the sink is unit-testable offline and
swappable to any requests-compatible client in production.

Two push paths: ``push_batch`` streams every row through the driver (the
reference's single-threaded shape — fine for modest curated streams);
``push_batch_distributed`` POSTs per PARTITION from the executors, so at
cluster scale the egress bandwidth is the fleet's, not one NIC's.  For
genuinely huge batches still prefer the Kafka sink
(``sources/ingest.write_kafka``) and let the downstream system pull.
"""

from __future__ import annotations

import gzip
import json
from collections.abc import Callable

from pyspark.sql import DataFrame


class PushClientError(Exception):
    """4xx — payload/auth problem (reference ImplyClientError parity)."""


class PushServerError(Exception):
    """5xx — retryable downstream failure (reference ImplyServerError parity)."""


def _post_payload(
    transport: Callable, url: str, auth_header: str | None, payload: bytes
) -> None:
    """One wire POST + the typed 4xx/5xx taxonomy — module-level so the
    executor-side path ships it in a closure without pickling a sink
    object, and both paths share ONE copy of the error mapping."""
    headers = {
        "Content-Type": "application/json",
        "Content-Encoding": "gzip",
    }
    if auth_header:
        headers["Authorization"] = auth_header
    resp = transport("POST", url, data=payload, headers=headers)
    if 400 <= resp.status_code < 500:
        raise PushClientError(f"{resp.status_code}: {resp.text}")
    if resp.status_code >= 500:
        raise PushServerError(f"{resp.status_code}: {resp.text}")


def _push_rows(
    rows,
    transport: Callable,
    url: str,
    auth_header: str | None,
    compresslevel: int,
    max_rows_per_post: int,
) -> int:
    """JSONL chunks → gzip → POST over an iterator of JSON strings; the
    shared kernel of the driver-side and per-partition paths."""
    pushed, chunk = 0, []
    for row in rows:
        chunk.append(row)
        if len(chunk) >= max_rows_per_post:
            _post_payload(transport, url, auth_header,
                          gzip.compress("\n".join(chunk).encode(),
                                        compresslevel))
            pushed += len(chunk)
            chunk = []
    if chunk:
        _post_payload(transport, url, auth_header,
                      gzip.compress("\n".join(chunk).encode(), compresslevel))
        pushed += len(chunk)
    return pushed


class HttpPushSink:
    """gzip-JSON POST sink with typed error taxonomy.

    ``transport(method, url, data=..., headers=...)`` returns a Response-like
    object (``status_code``, ``text``).
    """

    def __init__(
        self,
        url: str,
        transport: Callable,
        auth_header: str | None = None,
        compresslevel: int = 9,  # reference druid/push_streaming.py:60
        max_rows_per_post: int = 50_000,
    ) -> None:
        self.url = url
        self.transport = transport
        self.auth_header = auth_header
        self.compresslevel = compresslevel
        self.max_rows_per_post = max_rows_per_post

    def _post(self, payload: bytes) -> None:
        _post_payload(self.transport, self.url, self.auth_header, payload)

    def push_batch(self, batch: DataFrame, _epoch_id: int = 0) -> int:
        """foreachBatch body: rows → JSONL chunks → gzip → POST through the
        DRIVER. Returns rows pushed. Chunking bounds driver memory per
        POST, but every byte still crosses one machine's NIC — for big
        batches use :meth:`push_batch_distributed`."""
        return _push_rows(
            batch.toJSON().toLocalIterator(), self.transport, self.url,
            self.auth_header, self.compresslevel, self.max_rows_per_post,
        )

    def push_batch_distributed(self, batch: DataFrame, _epoch_id: int = 0) -> int:
        """Executor-side twin (VERDICT r7 #5): each PARTITION serializes,
        gzips, and POSTs its own rows — N executors post in parallel, so
        the wire bottleneck scales with the cluster instead of the one
        driver NIC (`push_batch` streams everything through
        ``toLocalIterator``; reference parity note: the reference's
        ``druid/push_streaming.py:59-82`` is also single-threaded, this is
        the beyond-reference scale path).  Same chunk cap, gzip level, and
        typed 4xx/5xx taxonomy via the shared kernel; a PushClientError on
        an executor fails the task → the batch → the query (at-least-once
        per POST, like the driver path; dedup belongs downstream).

        ``transport`` must be picklable (a module-level callable or a
        class instance — not a lambda): it ships to executors inside the
        partition closure."""
        transport, url = self.transport, self.url
        auth, lvl, cap = (
            self.auth_header, self.compresslevel, self.max_rows_per_post,
        )

        def _push_partition(rows):
            yield _push_rows(rows, transport, url, auth, lvl, cap)

        return sum(batch.toJSON().mapPartitions(_push_partition).collect())

    def writer(self, df: DataFrame, checkpoint: str, distributed: bool = False):
        """Attach as a streaming sink: checkpointed, at-least-once per POST
        (the reference's semantics; dedup belongs downstream).
        ``distributed=True`` posts from executors (see
        :meth:`push_batch_distributed`)."""
        body = self.push_batch_distributed if distributed else self.push_batch
        return (
            df.writeStream.foreachBatch(body)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
        )


class FileTransport:
    """File-spool transport: every POST lands as one ``.post`` file in
    ``outdir`` (shared filesystem) instead of crossing the wire — the
    offline/audit stand-in for a requests session, and the executor-side
    test double (it must be PICKLABLE and write somewhere that outlives
    the python worker, which an in-memory fake is not).  ``fail_code``
    forces the typed-error path."""

    def __init__(self, outdir: str, fail_code: int | None = None) -> None:
        self.outdir = outdir
        self.fail_code = fail_code

    def __call__(self, method, url, data=None, headers=None):
        import os
        import uuid

        if not self.fail_code:
            with open(
                os.path.join(self.outdir, f"{uuid.uuid4().hex}.post"), "wb"
            ) as f:
                f.write(data)

        class R:
            status_code = self.fail_code or 200
            text = "err" if self.fail_code else "ok"

        return R()


def parse_jsonl_gzip(payload: bytes) -> list[dict]:
    """Inverse of the wire format — for tests and downstream consumers."""
    return [json.loads(line) for line in gzip.decompress(payload).decode().splitlines()]
