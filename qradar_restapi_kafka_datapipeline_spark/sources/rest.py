"""REST search-source connector (SURVEY §2 B1/B2/B4/B20).

The reference drives QRadar's Ariel search lifecycle over HTTPS: POST the AQL,
long-poll for completion, sniff the result JSON's root array, then stream rows
(``qradar/qradarconnector.py:108-166``, ``qradar/search_executor.py:21-70``).
In the Spark engine that lifecycle is a *driver-side feeder*: it lands pages as
JSONL files (or Kafka messages) that ``sources.ingest`` consumes as a stream —
executors never talk to the REST API, so ingest parallelism and retry are
Spark's problem, not a thread pool's.

The transport is pluggable (any ``(method, url, **kw) -> Response-like``
callable), so the lifecycle logic is unit-testable offline and the real HTTP
client is an injection at deploy time.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable
from dataclasses import dataclass, field


class RestClientError(Exception):
    """4xx — caller's fault (bad AQL, auth). Mirrors QRadarClientError
    (reference qradar/qradarconnector.py:14-30)."""


class RestServerError(Exception):
    """5xx — server's fault, retryable. Mirrors QRadarServerError
    (reference qradar/qradarconnector.py:33-48)."""


@dataclass
class SearchLifecycle:
    """trigger → poll → fetch pages, with typed error taxonomy.

    ``transport(method, url, json=None, headers=None)`` must return an object
    with ``.status_code``, ``.json()`` and ``.text`` — the requests API shape.
    """

    base_url: str
    transport: Callable
    poll_interval_s: float = 1.0
    max_poll_attempts: int = 30
    page_size: int = 50_000
    headers: dict[str, str] = field(default_factory=dict)

    def _check(self, resp):
        if 400 <= resp.status_code < 500:
            try:
                msg = resp.json().get("message", resp.text)
            except Exception:
                msg = resp.text
            raise RestClientError(f"{resp.status_code}: {msg}")
        if resp.status_code >= 500:
            raise RestServerError(f"{resp.status_code}: {resp.text}")
        return resp

    def trigger_search(self, query_expression: str) -> str:
        """POST the query; returns the search id (cursor)."""
        resp = self._check(
            self.transport(
                "POST",
                f"{self.base_url}/api/ariel/searches",
                json={"query_expression": query_expression},
                headers=self.headers,
            )
        )
        return resp.json()["cursor_id"]

    def wait_for_completion(self, cursor_id: str) -> dict:
        """Bounded poll loop (reference search_executor.py:39-47)."""
        for _ in range(self.max_poll_attempts):
            resp = self._check(
                self.transport(
                    "GET",
                    f"{self.base_url}/api/ariel/searches/{cursor_id}",
                    headers=self.headers,
                )
            )
            status = resp.json()
            if status.get("completed"):
                return status
            time.sleep(self.poll_interval_s)
        raise TimeoutError(f"search {cursor_id} not complete after "
                           f"{self.max_poll_attempts} polls")

    def fetch_pages(self, cursor_id: str, record_count: int):
        """Yield result pages via Range headers (reference etl.py:57-65) —
        the offsets make re-ingest resumable, like Kafka offsets."""
        for start in range(0, record_count, self.page_size):
            stop = min(start + self.page_size, record_count) - 1
            resp = self._check(
                self.transport(
                    "GET",
                    f"{self.base_url}/api/ariel/searches/{cursor_id}/results",
                    headers={**self.headers, "Range": f"items={start}-{stop}"},
                )
            )
            payload = resp.json()
            # root-array discovery (reference _extract_parser_key,
            # qradarconnector.py:140-149): take the first list-valued key
            for v in payload.values():
                if isinstance(v, list):
                    yield v
                    break
            else:
                yield []

    def land_jsonl(self, query_expression: str, out_dir: str) -> int:
        """Full lifecycle: run the search and land pages as JSONL files that
        ``ingest.read_jsonl_stream`` picks up. Returns rows landed."""
        os.makedirs(out_dir, exist_ok=True)
        cursor = self.trigger_search(query_expression)
        status = self.wait_for_completion(cursor)
        n = 0
        for i, page in enumerate(self.fetch_pages(cursor, status["record_count"])):
            path = os.path.join(out_dir, f"{cursor}_{i:06d}.jsonl")
            tmp = path + ".tmp"
            with open(tmp, "w") as f:
                for row in page:
                    f.write(json.dumps(row) + "\n")
            os.rename(tmp, path)  # atomic: the stream never sees partial files
            n += len(page)
        return n
