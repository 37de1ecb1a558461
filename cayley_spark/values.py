"""Quad value model: the tagged union of node value kinds.

Mirrors the reference's ``quad.Value`` union (see SURVEY.md §1.2; the
authoritative physical decomposition is the reference SQL backend's
``nodes`` table, /root/reference/graph/sql/database.go:64-78).

Every value has two canonical string forms:

- ``term()``  — the N-Quads surface form (``<iri>``, ``_:b``, ``"s"``,
  ``"s"@en``, ``"s"^^<dt>``); typed values render via their xsd types.
  This is what results print as and what ``Order()`` sorts by
  (reference graph/iterator/sort.go:69-75 sorts by value string form).
- ``key()``   — the kind-tagged injective hash input. ``hash_str(key())``
  is the node id. The key grammar is chosen so Spark can compute it
  JVM-side with ``concat``/``cast`` (see store.py / graphs/): e.g.
  ``I:<iri-text>``, ``i:42``, ``f:5000.5`` (Java ``Double.toString``
  form), ``t:2024-01-01 00:00:00`` (Spark timestamp cast form).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from datetime import datetime

from .hashing import hash_str

XSD = "http://www.w3.org/2001/XMLSchema#"


def _escape(s: str) -> str:
    return (
        s.replace("\\", "\\\\")
        .replace('"', '\\"')
        .replace("\n", "\\n")
        .replace("\r", "\\r")
        .replace("\t", "\\t")
    )


def _unescape(s: str) -> str:
    out: list[str] = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            n = s[i + 1]
            out.append({"n": "\n", "r": "\r", "t": "\t"}.get(n, n))
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


class Value:
    __slots__ = ()

    def term(self) -> str:
        raise NotImplementedError

    def key(self) -> str:
        raise NotImplementedError

    @property
    def id(self) -> int:
        return hash_str(self.key())

    def native(self):
        """Collation to native Python (gizmo JSON semantics,
        reference query/gizmo/gizmo.go:124-136)."""
        return self.term()

    def __repr__(self) -> str:  # pragma: no cover
        return f"{type(self).__name__}({self.term()!r})"


@dataclass(frozen=True, slots=True, repr=False)
class IRI(Value):
    s: str

    def term(self) -> str:
        return f"<{self.s}>"

    def key(self) -> str:
        return f"I:{self.s}"

    def native(self):
        return f"<{self.s}>"


@dataclass(frozen=True, slots=True, repr=False)
class BNode(Value):
    s: str

    def term(self) -> str:
        return f"_:{self.s}"

    def key(self) -> str:
        return f"B:{self.s}"

    def native(self):
        return f"_:{self.s}"


@dataclass(frozen=True, slots=True, repr=False)
class String(Value):
    s: str

    def term(self) -> str:
        return f'"{_escape(self.s)}"'

    def key(self) -> str:
        return f"S:{self.s}"

    def native(self):
        return self.s


@dataclass(frozen=True, slots=True, repr=False)
class LangString(Value):
    s: str
    lang: str

    def term(self) -> str:
        return f'"{_escape(self.s)}"@{self.lang}'

    def key(self) -> str:
        return f"L:{self.lang}:{self.s}"

    def native(self):
        return {"@value": self.s, "@language": self.lang}


@dataclass(frozen=True, slots=True, repr=False)
class TypedString(Value):
    s: str
    datatype: str

    def term(self) -> str:
        return f'"{_escape(self.s)}"^^<{self.datatype}>'

    def key(self) -> str:
        return f"T:{self.datatype}:{self.s}"

    def native(self):
        return {"@value": self.s, "@type": self.datatype}


def java_double_str(x: float) -> str:
    """Java ``Double.toString`` — what Spark's ``cast(double as string)``
    produces. Needed so driver-side literal hashing matches JVM-side
    hashing of float nodes."""
    if math.isnan(x):
        return "NaN"
    if math.isinf(x):
        return "Infinity" if x > 0 else "-Infinity"
    if x == 0.0:
        return "-0.0" if math.copysign(1.0, x) < 0 else "0.0"
    a = abs(x)
    if 1e-3 <= a < 1e7:
        s = repr(a)
        if "e" in s or "E" in s:  # repr chose sci form; expand
            s = f"{a:.17g}"
        if "." not in s:
            s += ".0"
    else:
        # Java: d.dddE±e with one digit before the point, no plus sign
        s = repr(a)
        if "e" in s:
            mant, exp = s.split("e")
            if "." not in mant:
                mant += ".0"
            e = int(exp)
            s = f"{mant}E{e}"
        else:
            # repr gave decimal form but Java wants sci (|x|>=1e7 or <1e-3)
            m, e = f"{a:.16e}".split("e")
            m = m.rstrip("0")
            if m.endswith("."):
                m += "0"
            s = f"{m}E{int(e)}"
    return "-" + s if x < 0 else s


def spark_ts_str(dt: datetime) -> str:
    """Spark ``cast(timestamp as string)`` form: microseconds, trailing
    zeros trimmed, no fractional part if zero. tz-aware datetimes are
    normalized to UTC wall time first — GraphStore pins
    ``spark.sql.session.timeZone`` to UTC, so this is exactly what the
    JVM ingest path renders and driver/JVM node ids agree."""
    if dt.tzinfo is not None:
        from datetime import timezone as _tz

        dt = dt.astimezone(_tz.utc).replace(tzinfo=None)
    s = dt.strftime("%Y-%m-%d %H:%M:%S")
    if dt.microsecond:
        frac = f"{dt.microsecond:06d}".rstrip("0")
        s += "." + frac
    return s


@dataclass(frozen=True, slots=True, repr=False)
class Int(Value):
    v: int

    def term(self) -> str:
        return f'"{self.v}"^^<{XSD}integer>'

    def key(self) -> str:
        return f"i:{self.v}"

    def native(self):
        return self.v


@dataclass(frozen=True, slots=True, repr=False)
class Float(Value):
    v: float

    def term(self) -> str:
        return f'"{java_double_str(self.v)}"^^<{XSD}double>'

    def key(self) -> str:
        return f"f:{java_double_str(self.v)}"

    def native(self):
        return self.v


@dataclass(frozen=True, slots=True, repr=False)
class Bool(Value):
    v: bool

    def term(self) -> str:
        return f'"{"true" if self.v else "false"}"^^<{XSD}boolean>'

    def key(self) -> str:
        return f"b:{'true' if self.v else 'false'}"

    def native(self):
        return self.v


@dataclass(frozen=True, slots=True, repr=False)
class Time(Value):
    v: datetime

    def term(self) -> str:
        return f'"{self.v.isoformat()}"^^<{XSD}dateTime>'

    def key(self) -> str:
        return f"t:{spark_ts_str(self.v)}"

    def native(self):
        return self.v


@dataclass(frozen=True, slots=True, repr=False)
class Raw(Value):
    s: str

    def term(self) -> str:
        return self.s

    def key(self) -> str:
        return f"R:{self.s}"


def coerce(v) -> Value:
    """Python native → Value (str is treated as String; use IRI()/BNode()
    explicitly for identifiers, matching gizmo's g.IRI helper)."""
    if isinstance(v, Value):
        return v
    if isinstance(v, bool):
        return Bool(v)
    if isinstance(v, int):
        return Int(v)
    if isinstance(v, float):
        return Float(v)
    if isinstance(v, datetime):
        return Time(v)
    if isinstance(v, str):
        return parse_term(v) if _looks_like_term(v) else String(v)
    raise TypeError(f"cannot coerce {v!r} to a quad value")


def _looks_like_term(s: str) -> bool:
    return (s.startswith("<") and s.endswith(">")) or s.startswith("_:")


def parse_term(t: str) -> Value:
    """Parse a single N-Quads term into a Value."""
    if t.startswith("<") and t.endswith(">"):
        return IRI(t[1:-1])
    if t.startswith("_:"):
        return BNode(t[2:])
    if t.startswith('"'):
        end = _closing_quote(t)
        body = _unescape(t[1:end])
        rest = t[end + 1 :]
        if rest.startswith("@"):
            return LangString(body, rest[1:])
        if rest.startswith("^^<") and rest.endswith(">"):
            dt = rest[3:-1]
            if dt in (XSD + "integer", XSD + "int", XSD + "long"):
                return Int(int(body))
            if dt in (XSD + "double", XSD + "float", XSD + "decimal"):
                return Float(float(body))
            if dt == XSD + "boolean":
                return Bool(body == "true")
            if dt == XSD + "dateTime":
                return Time(datetime.fromisoformat(body.replace("Z", "+00:00")))
            return TypedString(body, dt)
        return String(body)
    return Raw(t)


def _closing_quote(t: str) -> int:
    i = 1
    while i < len(t):
        if t[i] == "\\":
            i += 2
            continue
        if t[i] == '"':
            return i
        i += 1
    raise ValueError(f"unterminated literal: {t!r}")
