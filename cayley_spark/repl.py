"""Interactive REPL over the language sessions.

Re-expression of the reference CLI REPL (internal/repl/repl.go,
cmd/cayley/command/repl.go:51-80): a line-oriented loop that executes
each query under the REPL collation with the reference's default
limit of 100, prints the collated strings, a ``N Results`` footer and
the elapsed time. ``:lang <name>`` switches the query language
(default gizmo, like the reference's --lang flag); ``:exit`` quits.
"""

from __future__ import annotations

import sys
import time

from .query.session import Collation, get_session
from .store import GraphStore

PS1 = "cayley> "
DEFAULT_LIMIT = 100


def run_repl(store: GraphStore, inp=None, out=None, lang: str = "gizmo") -> None:
    inp = inp if inp is not None else sys.stdin
    out = out if out is not None else sys.stdout
    ses = get_session(store, lang)
    while True:
        out.write(PS1)
        out.flush()
        line = inp.readline()
        if not line:
            break
        line = line.strip()
        if not line:
            continue
        if line in (":exit", ":quit", "exit"):
            break
        if line.startswith(":lang"):
            name = line.split(None, 1)[1].strip() if " " in line else ""
            try:
                ses = get_session(store, name)
                lang = name
                out.write(f"language: {lang}\n")
            except ValueError as e:
                out.write(f"error: {e}\n")
            continue
        if line == "help":
            out.write(
                "Help\n\texit // Exit\n\thelp // this help\n"
                "\t:d <quad> // delete quad\n\t:a <quad> // add quad\n"
                "\t:lang <name> // switch query language\n"
            )
            continue
        if line.startswith(":a ") or line.startswith(":d "):
            # reference repl.go:171-192 — add/delete one n-quad
            from .server.http import _parse_nquads_lines

            try:
                quads = _parse_nquads_lines(line[3:].strip())
                if len(quads) != 1:
                    raise ValueError("expected exactly one quad")
            except Exception as e:
                out.write(f"Error: not a valid quad: {e}\n")
                continue
            try:
                if line.startswith(":a "):
                    store = store.apply_deltas(add=quads)
                else:
                    store = store.apply_deltas(delete=quads)
                ses = get_session(store, lang)
            except Exception as e:
                out.write(f"error deleting: {e}\n")
            continue
        t0 = time.time()
        try:
            results = ses.execute(
                line, limit=DEFAULT_LIMIT, collation=Collation.REPL
            )
        except Exception as e:  # errors print, loop continues (repl.go)
            out.write(f"error: {e}\n")
            continue
        out.write("\n")
        n = 0
        for r in results:
            out.write(str(r))
            n += 1
        if n:
            plural = "s" if n > 1 else ""
            out.write(f"-----------\n{n} Result{plural}\n")
            out.write(
                "Elapsed time: %g ms\n\n" % ((time.time() - t0) * 1000.0)
            )
