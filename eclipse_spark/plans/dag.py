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
from dataclasses import dataclass, field
from typing import Any, Callable


def fingerprint_fn(fn: Callable[..., Any]) -> str:
    """Deterministic fingerprint of a user function: bytecode + consts +
    free-variable names. Mirrors Eclipse keying the Icache on the app
    binary name (``mapreduce.hh:120-134`` APPNAME) but is finer-grained:
    editing the function invalidates the cache."""
    code = getattr(fn, "__code__", None)
    if code is None:  # builtins / partials: fall back to repr
        return hashlib.sha256(repr(fn).encode()).hexdigest()[:16]
    payload = (
        code.co_code
        + repr(code.co_consts).encode()
        + repr(code.co_names).encode()
        + repr(code.co_varnames).encode()
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
