"""HTTP push-streaming sink (SURVEY §2 B13 — the Druid/Imply path).

The reference gzips a JSON payload (level 9) and POSTs it to
``/{project}/events/{endpoint}`` with Basic auth, mapping 4xx/5xx to typed
exceptions (reference ``druid/push_streaming.py:22-82``).  Here the same wire
behavior rides ``foreachBatch``: each micro-batch serializes driver-side-free
(``toJSON`` on executors → collected per batch partition-bounded), compresses,
and POSTs via a pluggable transport — so the sink is unit-testable offline and
swappable to any requests-compatible client in production.

For genuinely huge batches prefer the Kafka sink (``sources/ingest.write_kafka``)
and let the downstream system pull; HTTP push is for modest curated streams,
which is exactly the reference's usage.
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
        headers = {
            "Content-Type": "application/json",
            "Content-Encoding": "gzip",
        }
        if self.auth_header:
            headers["Authorization"] = self.auth_header
        resp = self.transport("POST", self.url, data=payload, headers=headers)
        if 400 <= resp.status_code < 500:
            raise PushClientError(f"{resp.status_code}: {resp.text}")
        if resp.status_code >= 500:
            raise PushServerError(f"{resp.status_code}: {resp.text}")

    def push_batch(self, batch: DataFrame, _epoch_id: int = 0) -> int:
        """foreachBatch body: rows → JSONL chunks → gzip → POST. Returns rows
        pushed. Chunking bounds driver memory per POST."""
        rows = batch.toJSON().toLocalIterator()
        pushed, chunk = 0, []
        for row in rows:
            chunk.append(row)
            if len(chunk) >= self.max_rows_per_post:
                self._post(gzip.compress("\n".join(chunk).encode(),
                                         self.compresslevel))
                pushed += len(chunk)
                chunk = []
        if chunk:
            self._post(gzip.compress("\n".join(chunk).encode(), self.compresslevel))
            pushed += len(chunk)
        return pushed

    def writer(self, df: DataFrame, checkpoint: str):
        """Attach as a streaming sink: checkpointed, at-least-once per POST
        (the reference's semantics; dedup belongs downstream)."""
        return (
            df.writeStream.foreachBatch(self.push_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
        )


def parse_jsonl_gzip(payload: bytes) -> list[dict]:
    """Inverse of the wire format — for tests and downstream consumers."""
    return [json.loads(line) for line in gzip.decompress(payload).decode().splitlines()]
