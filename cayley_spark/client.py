"""HTTP client for a running cayley_spark (or cayley) server — the
analog of the reference's Go client library (client/client.go:13-107
``New``/``QuadReader``/``QuadWriter``) plus the query surface the
newer go-client exposes.

Pure stdlib (urllib) — usable from any Python process with no Spark
dependency; the server side does the distributed work. Reads stream:
``quads()`` parses the chunked N-Quads (or pquads) response
incrementally, so a dump larger than client memory still iterates.
"""

from __future__ import annotations

import json
import re
import urllib.parse
import urllib.request
from typing import Iterable, Iterator

from .values import parse_term


class RequestFailed(Exception):
    """Non-2xx response (reference client.go errRequestFailed)."""

    def __init__(self, code: int, body: str):
        super().__init__(f"request failed: {code} {body[:200]}")
        self.code = code
        self.body = body


def _quad_line(q: tuple) -> str:
    parts = [v.term() for v in q if v is not None]
    return " ".join(parts) + " ."


class Client:
    """``Client("http://localhost:64210")``. Endpoints match the
    reference HTTP API v1/v2 (internal/http, client/client.go)."""

    def __init__(self, addr: str, timeout: float = 60.0):
        self.addr = addr.rstrip("/")
        self.timeout = timeout

    # ------------- plumbing -------------

    def _url(self, path: str, params: dict | None = None) -> str:
        u = self.addr + path
        if params:
            u += "?" + urllib.parse.urlencode(params)
        return u

    def _request(self, path: str, data: bytes | None = None,
                 params: dict | None = None):
        req = urllib.request.Request(self._url(path, params), data=data)
        try:
            return urllib.request.urlopen(req, timeout=self.timeout)
        except urllib.error.HTTPError as e:
            raise RequestFailed(e.code, e.read().decode(errors="replace"))

    # ------------- health -------------

    def health(self) -> bool:
        """GET /health — True iff the server answers 204."""
        try:
            with self._request("/health") as r:
                return r.status == 204
        except (RequestFailed, OSError):
            return False

    # ------------- quad I/O (client.go QuadReader/QuadWriter) ----

    def quads(self, fmt: str = "nquads") -> Iterator[tuple]:
        """Stream the full dump as (s, p, o, label) Value tuples
        (label None for the default graph). ``fmt="pquads"`` uses the
        binary wire format like the reference client's QuadReader."""
        if fmt == "pquads":
            from .sources.pquads import parse_pquads_bytes

            with self._request("/api/v2/read",
                               params={"format": "pquads"}) as r:
                data = r.read()  # non-splittable binary stream
            for q in parse_pquads_bytes(data):
                yield q
            return
        term = re.compile(
            r'<[^>]*>|_:[^\s]+|"(?:[^"\\]|\\.)*"(?:\^\^<[^>]*>|@[\w-]+)?'
        )
        with self._request("/api/v2/read") as r:
            for raw in r:  # chunked decoding is handled by http.client
                line = raw.decode().strip()
                if not line or line.startswith("#"):
                    continue
                terms = [m.group(0) for m in term.finditer(line)]
                if len(terms) in (3, 4):
                    vals = tuple(parse_term(t) for t in terms)
                    yield vals if len(vals) == 4 else (*vals, None)

    def write(self, quads: Iterable[tuple]) -> int:
        """POST /api/v2/write — add quads (tuples of Values, label
        optional). Returns the server-reported count."""
        body = "\n".join(_quad_line(q) for q in quads).encode()
        with self._request("/api/v2/write", data=body) as r:
            return json.loads(r.read()).get("count", 0)

    def delete(self, quads: Iterable[tuple]) -> int:
        """POST /api/v2/delete — remove quads."""
        body = "\n".join(_quad_line(q) for q in quads).encode()
        with self._request("/api/v2/delete", data=body) as r:
            return json.loads(r.read()).get("count", 0)

    # ------------- queries -------------

    def query(self, text: str, lang: str = "gizmo"):
        """POST /api/v1/query/{lang} — returns the parsed ``result``
        payload. ``lang`` ∈ gizmo|mql|graphql|sexp|linkedql."""
        with self._request(f"/api/v1/query/{lang}", data=text.encode()) as r:
            out = json.loads(r.read())
        if isinstance(out, dict) and "error" in out:
            raise RequestFailed(400, out["error"])
        return out.get("result") if isinstance(out, dict) else out
