"""ZKP DSL: `@zkp_program`, `Field` program nodes, constraints, gadgets.

Replaces `sunscreen/src/types/zkp/` (`field.rs`, `program_node.rs`,
`gadgets/{binary,arithmetic}.rs`) and the `#[zkp_program]` macro
(`sunscreen_compiler_macros/src/zkp_program.rs`) with its
`#[private]`/`#[public]`/`#[constant]` argument attributes — here
expressed as `Private[Field]`, `Public[Field]`, `Constant[Field]`
annotations (bare `Field` means private, like the reference default).
"""

from __future__ import annotations

import inspect
import threading
from typing import Callable

from sunscreen_tpu.zk.backend import (Gadget, ZkpOp, ZkpProgram,
                                      ZkpProgramContext)

_TLS = threading.local()


def _ctx() -> ZkpProgramContext:
    ctx = getattr(_TLS, "ctx", None)
    if ctx is None:
        raise RuntimeError("ZKP DSL types can only be used while a "
                           "#[zkp_program] is being traced")
    return ctx


class Field:
    """A native field element program node (reference:
    `types/zkp/field.rs`)."""

    def __init__(self, node: int):
        self.node = node

    # -- annotation plumbing -------------------------------------------------

    @staticmethod
    def _kind() -> str:
        return "private"

    # -- literals ------------------------------------------------------------

    @staticmethod
    def _lift(x) -> "Field":
        if isinstance(x, Field):
            return x
        return Field(_ctx().emit(ZkpOp.CONSTANT, (), int(x)))

    # -- arithmetic ----------------------------------------------------------

    def __add__(self, other):
        other = Field._lift(other)
        return Field(_ctx().emit(ZkpOp.ADD, (self.node, other.node)))

    __radd__ = __add__

    def __sub__(self, other):
        other = Field._lift(other)
        return Field(_ctx().emit(ZkpOp.SUB, (self.node, other.node)))

    def __rsub__(self, other):
        return Field._lift(other).__sub__(self)

    def __mul__(self, other):
        other = Field._lift(other)
        return Field(_ctx().emit(ZkpOp.MUL, (self.node, other.node)))

    __rmul__ = __mul__

    def __neg__(self):
        return Field(_ctx().emit(ZkpOp.NEG, (self.node,)))

    def __pow__(self, e: int):
        assert e >= 1
        result = None
        base = self
        while e:
            if e & 1:
                result = base if result is None else result * base
            e >>= 1
            if e:
                base = base * base
        return result

    # -- constraints ---------------------------------------------------------

    def constrain_eq(self, other):
        """Reference: `constrain_eq` constraint op."""
        other = Field._lift(other)
        diff = self - other
        _ctx().emit(ZkpOp.CONSTRAINT, (diff.node,), 0)
        return self

    def constrain_zero(self):
        _ctx().emit(ZkpOp.CONSTRAINT, (self.node,), 0)
        return self

    # -- gadget conveniences -------------------------------------------------

    def to_unsigned(self, bits: int) -> list["Field"]:
        """Binary decomposition via the ToUInt gadget; returns bit nodes
        (LSB first)."""
        outs = _ctx().invoke_gadget(ToUInt(bits), [self.node])
        return [Field(o) for o in outs]

    def inverse(self) -> "Field":
        (o,) = _ctx().invoke_gadget(Inverse(), [self.node])
        return Field(o)


class _KindAnnotation:
    def __init__(self, kind: str):
        self.kind = kind

    def __getitem__(self, inner):
        assert inner is Field
        return _FieldAnnotation(self.kind)


class _FieldAnnotation:
    def __init__(self, kind: str):
        self.kind = kind


Private = _KindAnnotation("private")
Public = _KindAnnotation("public")
Constant = _KindAnnotation("constant")


# --------------------------------------------------------------------------
# gadgets (reference: types/zkp/gadgets/)
# --------------------------------------------------------------------------

class ToUInt(Gadget):
    """Binary decomposition: N hidden bits b_i with b_i^2 = b_i and
    sum b_i 2^i = x (reference: `gadgets/binary.rs:8-45`)."""

    def __init__(self, bits: int):
        self.bits = bits
        self.gadget_input_count = 1
        self.hidden_input_count = bits

    def compute_hidden_inputs(self, inputs, f):
        x = inputs[0] % f
        if x >= (1 << self.bits):
            raise ValueError(
                f"value {x} does not fit in {self.bits} bits")
        return [(x >> i) & 1 for i in range(self.bits)]

    def gen_circuit(self, ctx, gadget_inputs, hidden_inputs):
        (x,) = gadget_inputs
        acc = None
        for i, b in enumerate(hidden_inputs):
            # b * (b - 1) == 0
            one = ctx.emit(ZkpOp.CONSTANT, (), 1)
            bm1 = ctx.emit(ZkpOp.SUB, (b, one))
            prod = ctx.emit(ZkpOp.MUL, (b, bm1))
            ctx.emit(ZkpOp.CONSTRAINT, (prod,), 0)
            coeff = ctx.emit(ZkpOp.CONSTANT, (), 1 << i)
            term = ctx.emit(ZkpOp.MUL, (b, coeff))
            acc = term if acc is None else ctx.emit(ZkpOp.ADD, (acc, term))
        diff = ctx.emit(ZkpOp.SUB, (acc, x))
        ctx.emit(ZkpOp.CONSTRAINT, (diff,), 0)
        return list(hidden_inputs)


class Inverse(Gadget):
    """Hidden inverse: x * inv == 1 (reference:
    `gadgets/arithmetic.rs:132-161`)."""

    gadget_input_count = 1
    hidden_input_count = 1

    def compute_hidden_inputs(self, inputs, f):
        x = inputs[0] % f
        if x == 0:
            raise ZeroDivisionError("inverse of zero in zkp program")
        return [pow(x, -1, f)]

    def gen_circuit(self, ctx, gadget_inputs, hidden_inputs):
        (x,) = gadget_inputs
        (inv,) = hidden_inputs
        prod = ctx.emit(ZkpOp.MUL, (x, inv))
        ctx.emit(ZkpOp.CONSTRAINT, (prod,), 1)
        return [inv]


class SignedModulus(Gadget):
    """Field division with remainder: given x (as unsigned field value)
    and modulus m, hidden (q, r) with x = q*m + r, 0 <= r < m
    (reference: `gadgets/arithmetic.rs:10-42`). `max_bits` bounds q and
    r for the range checks."""

    def __init__(self, modulus: int, max_bits: int):
        self.modulus = modulus
        self.max_bits = max_bits
        self.gadget_input_count = 1
        self.hidden_input_count = 2

    def compute_hidden_inputs(self, inputs, f):
        x = inputs[0] % f
        return [x // self.modulus, x % self.modulus]

    def gen_circuit(self, ctx, gadget_inputs, hidden_inputs):
        (x,) = gadget_inputs
        q, r = hidden_inputs
        m = ctx.emit(ZkpOp.CONSTANT, (), self.modulus)
        qm = ctx.emit(ZkpOp.MUL, (q, m))
        total = ctx.emit(ZkpOp.ADD, (qm, r))
        diff = ctx.emit(ZkpOp.SUB, (total, x))
        ctx.emit(ZkpOp.CONSTRAINT, (diff,), 0)
        # range checks: q < 2^max_bits, r < m via r in [0, 2^ceil) and
        # m - 1 - r in range
        ctx.invoke_gadget(ToUInt(self.max_bits), [q])
        rbits = max(1, (self.modulus - 1).bit_length())
        ctx.invoke_gadget(ToUInt(rbits), [r])
        mm1 = ctx.emit(ZkpOp.CONSTANT, (), self.modulus - 1)
        gap = ctx.emit(ZkpOp.SUB, (mm1, r))
        ctx.invoke_gadget(ToUInt(rbits), [gap])
        return [q, r]


# --------------------------------------------------------------------------
# @zkp_program
# --------------------------------------------------------------------------

class ZkpProgramFn:
    def __init__(self, fn: Callable, backend: str = "bulletproofs"):
        self.fn = fn
        self.name = fn.__name__
        self.backend_name = backend
        sig = inspect.signature(fn)
        self.arg_kinds: list[str] = []
        for p in sig.parameters.values():
            ann = p.annotation
            if ann is Field or ann is inspect.Parameter.empty:
                self.arg_kinds.append("private")
            elif isinstance(ann, _FieldAnnotation):
                self.arg_kinds.append(ann.kind)
            else:
                raise TypeError(
                    f"zkp_program arg {p.name!r}: annotate with Field / "
                    "Private[Field] / Public[Field] / Constant[Field]")
        self._cache: ZkpProgram | None = None

    def build(self) -> ZkpProgram:
        if self._cache is not None:
            return self._cache
        ctx = ZkpProgramContext()
        prev = getattr(_TLS, "ctx", None)
        _TLS.ctx = ctx
        try:
            counters = {"private": 0, "public": 0, "constant": 0}
            op_of = {"private": ZkpOp.PRIVATE_INPUT,
                     "public": ZkpOp.PUBLIC_INPUT,
                     "constant": ZkpOp.CONSTANT_INPUT}
            args = []
            for kind in self.arg_kinds:
                idx = counters[kind]
                counters[kind] += 1
                args.append(Field(ctx.emit(op_of[kind], (), idx)))
            self.fn(*args)
        finally:
            _TLS.ctx = prev
        self._cache = ctx.prog
        return ctx.prog


def zkp_program(backend: str = "bulletproofs"):
    """Decorator — reference parity: `#[zkp_program]`."""
    def wrap(fn):
        return ZkpProgramFn(fn, backend)
    return wrap


def constrain_eq(a: Field, b) -> None:
    a.constrain_eq(b)
