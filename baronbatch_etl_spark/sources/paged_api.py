"""Custom Python DataSource: the reference's paginated REST scan as a
first-class Spark source.

The reference's extractor walks a per-user match-id listing with
``?start=&count=`` pages (extractor/main.py:374-402, S1), splits big
jobs into fixed-size page tasks (api_service/main.py:154-164, T6) and
throttles under the API's 100-req/2-min budget (extractor/main.py:
61-63, T5). Here that becomes the idiomatic Spark shape:

* **pagination ≙ partition planning** — ``partitions()`` emits one
  ``InputPartition`` per (user, page), so a 1000-executor cluster
  fans page fetches out exactly like the reference's 4×50 task split,
  with Spark's scheduler as the queue (S9/S10 need no code);
* **point lookup ≙ partition pruning** — ``pushFilters`` accepts
  equality/IN/range predicates on ``user_id`` and plans only that
  user's pages (the reference's single-puuid path, S2-adjacent);
* **rate limit ≙ per-task throttle** — ``throttle_ms`` sleeps per
  page fetch; on a cluster the real budget is enforced where the
  reference enforced it, at the fetch boundary (each concurrent task
  holds one request slot, so requests/sec ≤ tasks·1000/throttle_ms);
* **queue-driven ingest ≙ streaming source** — the
  ``SimpleDataSourceStreamReader`` emits one page per micro-batch
  with the page number as the checkpointed offset: restart resumes at
  the committed page (T2), and a drained listing reports itself
  caught-up (availableNow terminates).

The fetch itself is pluggable; in-container it is a deterministic
fake (``match_id = "m-<user>-<idx>"``) so tests and the DuckDB oracle
(``s1_paginated_scan``) verify the planner bit-for-bit. A real
deployment swaps ``_fetch_page`` for the HTTP GET — partition
planning, pruning, throttling, and offsets are unchanged.

Simple-stream caveat (documented Spark contract): the simple stream
reader fetches on the driver and is for low-throughput sources —
which a rate-limited REST API is by definition; the batch reader is
the high-throughput path.
"""

from __future__ import annotations

import time
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)

SCHEMA = "user_id BIGINT, page INT, match_idx BIGINT, match_id STRING"


class RateLimited(Exception):
    """The fetch hit the API rate limit (HTTP 429 analog)."""


class StaleKey(Exception):
    """The fetch was rejected for a stale credential/identifier (the
    reference's 400 + "Exception decrypting" response)."""


class RetryPolicy:
    """The reference extractor's two recovery paths as a bounded,
    injectable policy (extractor/main.py:61-63 sleeps 120 s and retries
    on 429 — unbounded recursion there, bounded here; extractor/
    main.py:379-391 re-resolves the local PUUID and refetches once on a
    decryption-key mismatch).

    Runs inside each fetch task, so on a cluster every page task
    recovers independently — a 429 burst degrades throughput instead
    of failing the stage, and a bounded ``max_retries`` turns a dead
    API into a task error Spark's own task-retry/blacklisting handles
    (the unbounded reference loop would hang the executor forever).

    ``sleep`` is injectable for tests; the default backoff mirrors the
    reference's flat 120 s pause.
    """

    def __init__(
        self,
        max_retries: int = 5,
        backoff_ms: int = 120_000,
        sleep=time.sleep,
    ):
        self.max_retries = max_retries
        self.backoff_ms = backoff_ms
        self.sleep = sleep

    def call(self, fetch, refresh_key=None):
        """Run ``fetch()`` with bounded 429 backoff; on ``StaleKey``,
        call ``refresh_key()`` once and refetch (a second StaleKey —
        or no resolver — propagates, matching the reference's
        abort-batch path)."""
        refreshed = False
        rate_hits = 0
        while True:
            try:
                return fetch()
            except RateLimited:
                if rate_hits >= self.max_retries:
                    raise
                rate_hits += 1
                self.sleep(self.backoff_ms / 1000.0)
            except StaleKey:
                if refreshed or refresh_key is None:
                    raise
                refresh_key()
                refreshed = True


def _fetch_page(
    user_id: int, page: int, page_size: int
) -> list[tuple[int, int, int, str]]:
    """The pluggable fetch: GET /by-puuid/{user}/ids?start=&count= in
    the reference; a deterministic fake here (hash-free so the DuckDB
    oracle is a plain generate_series twin)."""
    start = page * page_size
    return [
        (user_id, page, start + i, f"m-{user_id}-{start + i}")
        for i in range(page_size)
    ]


class _Pages(InputPartition):
    def __init__(self, user_id: int, pages: tuple[int, ...]):
        self.user_id = user_id
        self.pages = pages


class PagedApiReader(DataSourceReader):
    def __init__(self, options):
        self.n_users = int(options.get("n_users", 50))
        self.pages = int(options.get("pages", 4))
        self.page_size = int(options.get("page_size", 25))
        self.throttle_ms = int(options.get("throttle_ms", 0))
        # task-overhead amortization: bundle N sequential pages of one
        # user into a single task (the Kafka-minPartitions /
        # maxFilesPerTrigger analog). Pruning granularity stays
        # per-user; fetch granularity stays per-page (the throttle
        # sleeps once per page, not per task).
        self.pages_per_task = int(options.get("pages_per_task", 1))
        self.retry = RetryPolicy(
            max_retries=int(options.get("max_retries", 5)),
            backoff_ms=int(options.get("retry_backoff_ms", 120_000)),
        )
        self._users: Sequence[int] = range(self.n_users)

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Prune the (user, page) plan with user_id predicates; every
        other filter is returned unsupported and Spark re-applies it
        after the scan (correctness never depends on pruning)."""
        for f in filters:
            if f.attribute != ("user_id",):
                yield f
            elif isinstance(f, EqualTo):
                self._users = [u for u in self._users if u == f.value]
            elif isinstance(f, In):
                vals = set(f.value)
                self._users = [u for u in self._users if u in vals]
            elif isinstance(f, GreaterThan):
                self._users = [u for u in self._users if u > f.value]
            elif isinstance(f, GreaterThanOrEqual):
                self._users = [u for u in self._users if u >= f.value]
            elif isinstance(f, LessThan):
                self._users = [u for u in self._users if u < f.value]
            elif isinstance(f, LessThanOrEqual):
                self._users = [u for u in self._users if u <= f.value]
            else:
                yield f

    def partitions(self) -> list[_Pages]:
        step = max(1, self.pages_per_task)
        return [
            _Pages(u, tuple(range(p, min(p + step, self.pages))))
            for u in self._users
            for p in range(0, self.pages, step)
        ]

    def read(self, part: _Pages):
        # Rows cross the source boundary as ONE Arrow record batch
        # per task instead of pickled tuples (the documented
        # RecordBatch return of the Python DataSource API; guide §4 —
        # batches over rows, and one batch per task keeps batches as
        # large as the task allows). Fetch granularity, throttling
        # and retry stay per page — only the serialization changed
        # (measured 0.63 → 0.53 s on the s1 rollup at sf0.1; the
        # remaining cost is per-task Python worker overhead, which is
        # the partition-planning FEATURE: one slot per page bundle).
        import pyarrow as pa

        rows: list[tuple[int, int, int, str]] = []
        for page in part.pages:
            if self.throttle_ms:
                time.sleep(self.throttle_ms / 1000.0)
            # the in-container fake never raises; a real _fetch_page
            # raises RateLimited/StaleKey and recovers per the policy
            rows.extend(
                self.retry.call(
                    lambda: _fetch_page(part.user_id, page, self.page_size)
                )
            )
        yield pa.RecordBatch.from_arrays(
            [
                pa.array([r[0] for r in rows], pa.int64()),
                pa.array([r[1] for r in rows], pa.int32()),
                pa.array([r[2] for r in rows], pa.int64()),
                pa.array([r[3] for r in rows], pa.string()),
            ],
            names=["user_id", "page", "match_idx", "match_id"],
        )


class PagedApiStreamReader(SimpleDataSourceStreamReader):
    """One page per micro-batch across all users; offset = next page.
    A drained listing returns an empty batch with an unchanged offset,
    so availableNow/processAllAvailable terminate."""

    def __init__(self, options):
        self.n_users = int(options.get("n_users", 50))
        self.pages = int(options.get("pages", 4))
        self.page_size = int(options.get("page_size", 25))
        # same bounded recovery as the batch reader — a 429 mid-batch
        # backs off instead of failing the micro-batch (whose replay
        # would refetch every page of the offset range)
        self.retry = RetryPolicy(
            max_retries=int(options.get("max_retries", 5)),
            backoff_ms=int(options.get("retry_backoff_ms", 120_000)),
        )

    def initialOffset(self) -> dict:
        return {"page": 0}

    def _pages_between(self, first: int, last: int) -> list[tuple]:
        # list, not generator: the simple-stream wrapper pickles the
        # prefetched batch into its cache, and generators can't pickle
        return [
            r
            for page in range(first, min(last, self.pages))
            for u in range(self.n_users)
            for r in self.retry.call(
                lambda: _fetch_page(u, page, self.page_size)
            )
        ]

    def read(self, start: dict):
        page = int(start["page"])
        if page >= self.pages:
            return iter([]), {"page": page}
        return iter(self._pages_between(page, page + 1)), {"page": page + 1}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        """Failure recovery: Spark replays a batch that reached the
        write-ahead offset log but not the commit log by re-reading
        [start, end). The fetch is deterministic, so the replay is
        bit-identical to the lost batch — without this, a crash
        between WAL and commit would fail every restart."""
        return iter(self._pages_between(int(start["page"]), int(end["page"])))


class PagedApiDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "paged_api"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> PagedApiReader:
        return PagedApiReader(self.options)

    def simpleStreamReader(self, schema) -> PagedApiStreamReader:
        return PagedApiStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the ``paged_api`` format (+ the
    runtime conf that lets Python sources receive pushed filters)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(PagedApiDataSource)
