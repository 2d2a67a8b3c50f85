"""Dataflow tracing for module graphs — the engine planner's eyes.

The int8 chain planner must know which module CONSUMES each module's
output (leaf/definition order is wrong for branching graphs: residual
adds, concat branches — the reference's QuantAdd/QuantConcat union-scale
design, iao/quantize.py:1441-1498, exists precisely so the integer add
needs no rescale, and exploiting it requires real dataflow).

Mechanism: run ONE eager forward on a small example input with the
relevant module classes' ``__call__`` temporarily wrapped to record
``(module, input-producers, output)`` into a trace. Containers need no
handling — they return their last child's output array *object*, so
provenance flows through them for free.  Functional glue that is
value-preserving on int8 codes (``channel_shuffle``) registers an alias
instead.  Any UNTRACKED op (e.g. a bare ``jax.nn.relu`` in a model's
forward) breaks provenance, which fails SAFE: links through it are
simply never chained and stay f32.

A module called more than once is recorded per call; the planner treats
multi-call modules conservatively (no emit-side chaining).
"""

from __future__ import annotations

import contextlib
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

__all__ = ["Trace", "trace_dataflow"]


def _is_tensor(x) -> bool:
    return hasattr(x, "dtype") and hasattr(x, "shape")


class Trace:
    """Result of a traced forward: per-call records + producer map."""

    def __init__(self):
        self.calls: List[Tuple[nnx.Module, Tuple[Optional[nnx.Module], ...]]] = []
        self._producer: Dict[int, nnx.Module] = {}
        self._keep: list = []  # keepalive: id() keys must not be recycled

    def record(self, mod: nnx.Module, args, out) -> None:
        ins = tuple(self._producer.get(id(a)) for a in args if _is_tensor(a))
        self.calls.append((mod, ins))
        outs = out if isinstance(out, (tuple, list)) else (out,)
        for o in outs:
            if _is_tensor(o):
                self._producer[id(o)] = mod
                self._keep.append(o)
        self._keep.extend(a for a in args if _is_tensor(a))

    def alias(self, new, old) -> None:
        """Mark ``new`` as carrying the same produced value as ``old``
        (a value-preserving functional transform, e.g. channel shuffle)."""
        p = self._producer.get(id(old))
        if p is not None:
            self._producer[id(new)] = p
            self._keep.append(new)

    # -- planner queries ---------------------------------------------------

    def consumers(self) -> Dict[int, List[nnx.Module]]:
        """id(module) -> modules that consumed one of its outputs."""
        out: Dict[int, List[nnx.Module]] = {}
        for mod, ins in self.calls:
            for p in ins:
                if p is not None:
                    out.setdefault(id(p), []).append(mod)
        return out

    def call_counts(self) -> Dict[int, int]:
        counts: Dict[int, int] = {}
        for mod, _ in self.calls:
            counts[id(mod)] = counts.get(id(mod), 0) + 1
        return counts


@contextlib.contextmanager
def _patched_calls(types: Sequence[type], trace: Trace):
    orig = {}

    def wrap(f):
        def wrapper(self, *args, **kwargs):
            out = f(self, *args, **kwargs)
            trace.record(self, args, out)
            return out

        return wrapper

    try:
        for t in dict.fromkeys(types):
            orig[t] = t.__call__
            t.__call__ = wrap(orig[t])
        yield
    finally:
        for t, f in orig.items():
            t.__call__ = f


@contextlib.contextmanager
def _patched_shuffle(trace: Trace):
    from ..nn import functional as F

    orig = F.channel_shuffle

    def wrapper(x, groups):
        out = orig(x, groups)
        trace.alias(out, x)
        return out

    F.channel_shuffle = wrapper
    try:
        yield
    finally:
        F.channel_shuffle = orig


def trace_dataflow(
    model: nnx.Module, example_input: jax.Array, node_types: Sequence[type]
) -> Trace:
    """Run one eager forward of ``model`` on ``example_input`` recording
    calls of modules whose type is in ``node_types``.

    The example input should be the real spatial/channel shape (batch may
    be 1) so static pooling windows hold. Runs outside jit — the trace
    needs concrete array object identity.
    """
    trace = Trace()
    x = jnp.zeros(example_input.shape, example_input.dtype)
    with _patched_calls(node_types, trace), _patched_shuffle(trace):
        model(x)
    return trace
