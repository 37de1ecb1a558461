"""Transaction — ordered delta list with add/delete de-duplication.

Re-expression of /root/reference/graph/transaction.go:20-65: a
Transaction buffers AddQuad/RemoveQuad calls, cancelling an add
against a later remove of the same quad (and vice versa), then
applies atomically via GraphStore.apply_deltas."""

from __future__ import annotations

from .store import GraphStore
from .values import coerce


def _key(q: tuple) -> tuple:
    q = tuple(coerce(x) if x is not None else None for x in q)
    if len(q) == 3:
        q = (*q, None)
    return tuple(v.id if v is not None else None for v in q)


class Transaction:
    def __init__(self):
        self._ops: dict[tuple, tuple[str, tuple]] = {}
        self._order: list[tuple] = []

    def add_quad(self, *q) -> None:
        k = _key(q)
        prev = self._ops.get(k)
        if prev and prev[0] == "delete":
            del self._ops[k]  # delete+add cancel (transaction.go:40-49)
            return
        if k not in self._ops:
            self._order.append(k)
        self._ops[k] = ("add", q)

    def remove_quad(self, *q) -> None:
        k = _key(q)
        prev = self._ops.get(k)
        if prev and prev[0] == "add":
            del self._ops[k]
            return
        if k not in self._ops:
            self._order.append(k)
        self._ops[k] = ("delete", q)

    def apply(self, store: GraphStore) -> GraphStore:
        adds = [q for op, q in self._ops.values() if op == "add"]
        dels = [q for op, q in self._ops.values() if op == "delete"]
        return store.apply_deltas(add=adds, delete=dels)
