"""A tiny explicit op-DAG — the engine's IR.

Eclipse has no plan IR (its "plan" is the ``master_job``/``master_task``
object graph, ``src/master/master_job.hh:20-86``); its semantic cache
therefore keys on the coarse string ``"<appname>_<inputfile>"``
(``src/file_distributor/fileserver.hh:352-359``). Our fluent API builds
this DAG alongside the DataFrame chain, which gives a *precise* cache
key: the fingerprint covers every operator, its parameters, the user
functions' bytecode, and the input snapshot versions.

We deliberately do NOT introspect Catalyst plans from Python — the DAG
is maintained at the API layer, so fingerprinting is trivial and stable
across Spark versions.
"""

from __future__ import annotations

import hashlib
import json
import re
import types
from dataclasses import dataclass, field
from typing import Any, Callable

# repr() of instances/code objects embeds `at 0x7f...` memory addresses,
# which are process-unstable — strip them so fingerprints survive across
# sessions (the cross-session S3/HDFS cache depends on this).
_ADDR_RE = re.compile(r" at 0x[0-9a-fA-F]+")


def _stable_repr(v: Any) -> bytes:
    return _ADDR_RE.sub("", repr(v)).encode()


def _value_payload(v: Any) -> bytes:
    """Fingerprint payload for a captured value: callables recurse (so a
    captured helper function's own bytecode matters), everything else is
    address-stripped repr."""
    if callable(v):
        return b"<fn:" + fingerprint_fn(v).encode() + b">"
    return _stable_repr(v)


def _code_payload(code: types.CodeType) -> bytes:
    """Recursive payload for a code object: nested code objects (lambdas,
    comprehensions, inner defs) are fingerprinted structurally instead of
    repr()'d (repr embeds their memory address)."""
    parts = [code.co_code]
    for c in code.co_consts:
        if isinstance(c, types.CodeType):
            parts.append(b"<code:" + _code_payload(c) + b">")
        else:
            parts.append(_stable_repr(c))
    parts.append(
        _stable_repr((code.co_names, code.co_varnames, code.co_freevars, code.co_argcount))
    )
    return b"\x00".join(parts)


def fingerprint_fn(fn: Callable[..., Any]) -> str:
    """Deterministic fingerprint of a user function: bytecode, consts,
    names, *and the values bound outside the bytecode* — closure cells,
    ``__defaults__``/``__kwdefaults__``, and ``functools.partial`` args.
    Mirrors Eclipse keying the Icache on the app binary name
    (``mapreduce.hh:120-134`` APPNAME) but is finer-grained: editing the
    function OR re-binding a captured parameter invalidates the cache
    (two ``make(k)`` lambdas with different ``k`` must NOT collide —
    otherwise the cache would serve silently wrong results)."""
    code = getattr(fn, "__code__", None)
    if code is None:
        # functools.partial: recurse into the wrapped fn + bound args.
        inner = getattr(fn, "func", None)
        if callable(inner):
            payload = (
                _value_payload(inner)
                + _stable_repr(getattr(fn, "args", ()))
                + _stable_repr(tuple(sorted((getattr(fn, "keywords", None) or {}).items())))
            )
            return hashlib.sha256(payload).hexdigest()[:16]
        return hashlib.sha256(_stable_repr(fn)).hexdigest()[:16]
    cells = []
    for cell in getattr(fn, "__closure__", None) or ():
        try:
            cells.append(_value_payload(cell.cell_contents))
        except ValueError:  # empty cell (still-building recursive def)
            cells.append(b"<empty-cell>")
    payload = b"\x01".join(
        [
            _code_payload(code),
            *cells,
            _stable_repr(getattr(fn, "__defaults__", None)),
            _stable_repr(tuple(sorted((getattr(fn, "__kwdefaults__", None) or {}).items()))),
        ]
    )
    return hashlib.sha256(payload).hexdigest()[:16]


@dataclass(frozen=True)
class PlanNode:
    """One operator application in the engine IR."""

    op: str
    params: tuple[tuple[str, str], ...] = field(default_factory=tuple)
    children: tuple["PlanNode", ...] = field(default_factory=tuple)

    @staticmethod
    def leaf(op: str, **params: Any) -> "PlanNode":
        return PlanNode(op=op, params=_norm_params(params))

    def child(self, op: str, **params: Any) -> "PlanNode":
        return PlanNode(op=op, params=_norm_params(params), children=(self,))

    @staticmethod
    def merge(op: str, children: tuple["PlanNode", ...], **params: Any) -> "PlanNode":
        return PlanNode(op=op, params=_norm_params(params), children=children)

    def to_dict(self) -> dict[str, Any]:
        return {
            "op": self.op,
            "params": list(self.params),
            "children": [c.to_dict() for c in self.children],
        }

    def fingerprint(self) -> str:
        blob = json.dumps(self.to_dict(), sort_keys=True, separators=(",", ":"))
        return hashlib.sha256(blob.encode()).hexdigest()[:24]

    def describe(self, indent: int = 0) -> str:
        pad = "  " * indent
        line = f"{pad}{self.op}({', '.join(f'{k}={v}' for k, v in self.params)})"
        return "\n".join([line] + [c.describe(indent + 1) for c in self.children])


def _norm_params(params: dict[str, Any]) -> tuple[tuple[str, str], ...]:
    out = []
    for k in sorted(params):
        v = params[k]
        if callable(v):
            v = fingerprint_fn(v)
        out.append((k, str(v)))
    return tuple(out)
