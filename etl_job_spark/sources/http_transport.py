"""Production HTTP transport for the JSON-API source.

The reference POSTs ``{s_code, hd_code, sp_code, sale_date}`` to a POS
API and branches on HTTP status and the body's ``ret_code``
(/root/reference/load_sales_data.py:89-100), one fresh connection per
request, no retry — a transient 503 loses that (store, day) until a
human reruns the script. This transport is what
``sources/json_api.fetch_json`` plugs in for real runs:

- **one session per executor worker** — the object ships pickled into
  ``mapInPandas``; the underlying ``requests.Session`` (keep-alive
  connection pool) is created lazily after unpickling and reused for
  every request the partition makes, vs the reference's
  connection-per-fetch;
- **bounded exponential backoff with jitter** on connection errors,
  timeouts, and retryable statuses (429/5xx) — deterministic-jitter
  seeded per request key so retries of a hot batch don't synchronize;
- **fail-fast on non-retryable statuses** (4xx): raising makes
  ``fetch_json`` emit an ``error`` row, which
  ``sinks.split_quarantine`` routes to the dead-letter table — the
  engine's replacement for the reference's log-and-continue
  (load_sales_data.py:137-140). ``ret_code`` taxonomy stays in
  ``fetch_json``: a 200 with a bad ``ret_code`` is a *semantic*
  failure, quarantined with the payload for replay, never retried
  (retrying a deterministic rejection just hammers the API).
"""

from __future__ import annotations

import time
import zlib
from collections.abc import Callable, Mapping

DEFAULT_RETRY_STATUSES = frozenset({408, 429, 500, 502, 503, 504})


def reference_body(sp_code: str, sale_date: str) -> dict:
    """The reference's request shape (load_sales_data.py:84-88)."""
    return {"sp_code": sp_code, "sale_date": sale_date}


class HttpJsonTransport:
    """POST-per-request transport: ``transport(sp_code, sale_date) -> text``.

    Picklable: everything is plain config; the live session is rebuilt
    lazily in whichever process calls it (driver in tests, executor
    workers under ``mapInPandas``).
    """

    def __init__(
        self,
        url: str,
        headers: Mapping[str, str] | None = None,
        body_fn: Callable[[str, str], dict] = reference_body,
        timeout: float = 10.0,
        max_attempts: int = 4,
        backoff_base: float = 0.25,
        backoff_cap: float = 8.0,
        retry_statuses: frozenset[int] = DEFAULT_RETRY_STATUSES,
    ):
        self.url = url
        self.headers = dict(headers or {"Content-Type": "application/json"})
        self.body_fn = body_fn
        self.timeout = timeout
        self.max_attempts = max_attempts
        self.backoff_base = backoff_base
        self.backoff_cap = backoff_cap
        self.retry_statuses = frozenset(retry_statuses)
        self._session = None

    # -- pickling: never ship a live socket pool ----------------------
    def __getstate__(self):
        state = dict(self.__dict__)
        state["_session"] = None
        return state

    def _get_session(self):
        if self._session is None:
            import requests

            self._session = requests.Session()
        return self._session

    def _sleep_before_retry(self, attempt: int, key: str) -> None:
        # deterministic jitter per (key, attempt): retries spread out
        # but a rerun of the same failing key behaves identically —
        # crc32, not hash(), which PYTHONHASHSEED salts per process
        span = min(self.backoff_cap, self.backoff_base * (2**attempt))
        frac = (zlib.crc32(f"{key}:{attempt}".encode()) % 1000) / 1000.0
        time.sleep(span * (0.5 + 0.5 * frac))

    def __call__(self, sp_code: str, sale_date: str) -> str:
        import requests

        key = f"{sp_code}:{sale_date}"
        last_err: Exception | None = None
        for attempt in range(self.max_attempts):
            if attempt:
                self._sleep_before_retry(attempt - 1, key)
            try:
                resp = self._get_session().post(
                    self.url,
                    json=self.body_fn(sp_code, sale_date),
                    headers=self.headers,
                    timeout=self.timeout,
                )
            except (requests.ConnectionError, requests.Timeout) as exc:
                last_err = exc
                self._session = None  # pool may be poisoned; rebuild
                continue
            if resp.status_code == 200:
                return resp.text
            if resp.status_code in self.retry_statuses:
                last_err = RuntimeError(f"HTTP {resp.status_code} (retryable)")
                continue
            # non-retryable: quarantine, don't hammer
            raise RuntimeError(f"HTTP {resp.status_code}: {resp.text[:200]}")
        raise RuntimeError(
            f"gave up after {self.max_attempts} attempts for {key}: {last_err}"
        )
