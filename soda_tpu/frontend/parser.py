"""`.soda` parser: lark grammar -> raw statement objects -> StencilProgram.

Analog of the reference's src/sodac frontend dispatch + src/soda/grammar.py
textX semantic classes (SodaProgram, InputStmt, LocalStmt, OutputStmt,
ParamStmt, directive stmts) — reconstructed per SURVEY.md §2.1/§2.4 (empty
reference mount; no file:line cites possible).

Ref-vs-call disambiguation: `t(0, 1)` parses as a generic Apply; the builder
resolves it to a tensor Ref when `t` is a declared tensor (offsets must fold
to integer constants) and to a math Call otherwise.
"""

from __future__ import annotations

import dataclasses
import pathlib
from typing import Any

import lark

from ..ir import expr as ir
from ..ir.program import Param, StencilProgram, Tensor
from ..ir.types import ScalarType

_GRAMMAR_PATH = pathlib.Path(__file__).with_name("grammar.lark")
_parser: lark.Lark | None = None


def _get_parser() -> lark.Lark:
    global _parser
    if _parser is None:
        _parser = lark.Lark(
            _GRAMMAR_PATH.read_text(),
            parser="earley",
            lexer="dynamic_complete",
            maybe_placeholders=False,
        )
    return _parser


# ---- raw statements ----------------------------------------------------------


@dataclasses.dataclass
class _Apply(ir.Expr):
    """Unresolved name(args...) — becomes Ref or Call during build."""

    name: str
    args: tuple[ir.Expr, ...]

    def children(self):
        return self.args


@dataclasses.dataclass
class RawInput:
    type: ScalarType
    name: str
    tile_size: tuple[int | None, ...]
    dram: tuple[int, ...]


@dataclasses.dataclass
class RawStage:
    kind: str  # 'local' | 'output'
    type: ScalarType
    name: str
    anchor: tuple[int, ...]
    expr: ir.Expr
    dram: tuple[int, ...]


@dataclasses.dataclass
class RawParam:
    type: ScalarType
    name: str
    shape: tuple[int, ...]
    dup: int | None
    partition: str | None


@dataclasses.dataclass
class RawProgram:
    name: str | None = None
    burst_width: int = 512
    iterate: int = 1
    unroll_factor: int = 1
    border: str = "ignore"
    cluster: str = "none"
    inputs: list[RawInput] = dataclasses.field(default_factory=list)
    stages: list[RawStage] = dataclasses.field(default_factory=list)
    params: list[RawParam] = dataclasses.field(default_factory=list)


class _Xform(lark.Transformer):
    """Lark tree -> RawProgram pieces / Expr nodes."""

    # -- leaves
    def name(self, toks):
        return str(toks[0])

    def type(self, toks):
        return ScalarType.parse(str(toks[0]))

    def int_number(self, toks):
        return ir.Const(int(toks[0]))

    def hex_number(self, toks):
        return ir.Const(int(str(toks[0]), 16))

    def float_number(self, toks):
        s = str(toks[0]).rstrip("fF")
        return ir.Const(float(s))

    def sint_plain(self, toks):
        return int(toks[0])

    def sint_neg(self, toks):
        return -int(toks[0])

    def sint_pos(self, toks):
        return int(toks[0])

    # -- expressions
    def select(self, c):
        return ir.Select(c[0], c[1], c[2])

    def _bin(op):
        def f(self, c):
            return ir.BinOp(op, c[0], c[1])
        return f

    lor = _bin("||"); land = _bin("&&")
    bor = _bin("|"); bxor = _bin("^"); band = _bin("&")
    eq = _bin("=="); ne = _bin("!=")
    lt = _bin("<"); gt = _bin(">"); le = _bin("<="); ge = _bin(">=")
    shl = _bin("<<"); shr = _bin(">>")
    add = _bin("+"); sub = _bin("-")
    mul = _bin("*"); div = _bin("/"); mod = _bin("%")
    del _bin

    def neg(self, c):
        return ir.UnOp("-", c[0])

    def pos(self, c):
        return ir.UnOp("+", c[0])

    def lnot(self, c):
        return ir.UnOp("!", c[0])

    def bnot(self, c):
        return ir.UnOp("~", c[0])

    def cast(self, c):
        return ir.Cast(ScalarType.parse(str(c[0])), c[1])

    def apply(self, c):
        return _Apply(c[0], tuple(c[1:]))

    def param_ref(self, c):
        return ("param_ref", c[0], tuple(c[1:]))

    def var(self, c):
        return ("var", c[0])

    # -- statement pieces
    def lhs_ref(self, c):
        return (c[0], tuple(c[1:]))

    def dram_spec(self, c):
        return tuple(int(t) for t in c)

    def subscript(self, c):
        return int(c[0])

    def tile_fixed(self, c):
        return int(c[0])

    def tile_star(self, c):
        return None

    def tile_sizes(self, c):
        return tuple(c)

    def attr_dup(self, c):
        return ("dup", int(c[0]))

    def attr_partition(self, c):
        return ("partition", str(c[0]) + (f":{c[1]}" if len(c) > 1 else ""))

    # -- statements
    def kernel_stmt(self, c):
        return ("kernel", c[0])

    def burst_stmt(self, c):
        return ("burst", int(c[0]))

    def iterate_stmt(self, c):
        return ("iterate", int(c[0]))

    def unroll_stmt(self, c):
        return ("unroll", int(c[0]))

    def border_stmt(self, c):
        return ("border", c[0])

    def cluster_stmt(self, c):
        return ("cluster", c[0])

    def input_stmt(self, c):
        if len(c) == 4:
            dram, typ, name, tiles = c
        else:
            typ, name, tiles = c
            dram = (1,)
        return ("input", RawInput(typ, name, tiles, dram))

    def local_stmt(self, c):
        typ, (name, anchor), expr = c
        return ("stage", RawStage("local", typ, name, anchor, expr, (1,)))

    def output_stmt(self, c):
        if len(c) == 4:
            dram, typ, (name, anchor), expr = c
        else:
            typ, (name, anchor), expr = c
            dram = (1,)
        return ("stage", RawStage("output", typ, name, anchor, expr, dram))

    def param_stmt(self, c):
        typ = c[0]
        attrs = [x for x in c[1:] if isinstance(x, tuple) and x[0] in ("dup", "partition")]
        rest = [x for x in c[1:] if not (isinstance(x, tuple) and x[0] in ("dup", "partition"))]
        name = rest[0]
        shape = tuple(int(s) for s in rest[1:])
        dup = next((v for k, v in attrs if k == "dup"), None)
        part = next((v for k, v in attrs if k == "partition"), None)
        return ("param", RawParam(typ, name, shape, dup, part))

    def start(self, c):
        return list(c)


def parse_raw(text: str) -> RawProgram:
    tree = _get_parser().parse(text)
    stmts = _Xform().transform(tree)
    prog = RawProgram()
    for kind, val in stmts:
        if kind == "kernel":
            prog.name = val
        elif kind == "burst":
            prog.burst_width = val
        elif kind == "iterate":
            prog.iterate = val
        elif kind == "unroll":
            prog.unroll_factor = val
        elif kind == "border":
            prog.border = val
        elif kind == "cluster":
            prog.cluster = val
        elif kind == "input":
            prog.inputs.append(val)
        elif kind == "stage":
            prog.stages.append(val)
        elif kind == "param":
            prog.params.append(val)
    return prog


# ---- build: raw -> StencilProgram --------------------------------------------


def _fold_int(e: ir.Expr) -> int | None:
    """Fold an expression to an int constant (for ref offsets)."""
    if isinstance(e, ir.Const) and isinstance(e.value, int):
        return e.value
    if isinstance(e, ir.UnOp) and e.op in ("-", "+"):
        v = _fold_int(e.operand)
        if v is not None:
            return -v if e.op == "-" else v
    return None


def _resolve(e: Any, tensor_names: set[str], param_names: set[str]) -> ir.Expr:
    """Resolve _Apply/var/param_ref placeholders into typed IR nodes."""
    if isinstance(e, _Apply):
        args = tuple(_resolve(a, tensor_names, param_names) for a in e.args)
        if e.name in tensor_names:
            offs = tuple(_fold_int(a) for a in args)
            if any(o is None for o in offs):
                raise ValueError(
                    f"tensor ref {e.name}(...) requires integer constant offsets")
            return ir.Ref(e.name, offs)  # type: ignore[arg-type]
        if e.name in ir.MATH_FNS:
            return ir.Call(e.name, args)
        raise ValueError(
            f"{e.name!r} is neither a declared tensor nor a known function "
            f"(known fns: {sorted(ir.MATH_FNS)})")
    if isinstance(e, tuple) and len(e) == 3 and e[0] == "param_ref":
        _, name, idx_exprs = e
        if name not in param_names:
            raise ValueError(f"subscripted name {name!r} is not a declared param")
        idxs = []
        for ie in idx_exprs:
            iv = _fold_int(_resolve(ie, tensor_names, param_names))
            if iv is None:
                raise ValueError(f"param index of {name!r} must be a constant")
            idxs.append(iv)
        return ir.ParamRef(name, tuple(idxs))
    if isinstance(e, tuple) and len(e) == 2 and e[0] == "var":
        name = e[1]
        if name in param_names:
            return ir.Var(name)
        raise ValueError(f"bare identifier {name!r} is not a declared param")
    if isinstance(e, ir.BinOp):
        return ir.BinOp(e.op, _resolve(e.lhs, tensor_names, param_names),
                        _resolve(e.rhs, tensor_names, param_names))
    if isinstance(e, ir.UnOp):
        return ir.UnOp(e.op, _resolve(e.operand, tensor_names, param_names))
    if isinstance(e, ir.Cast):
        return ir.Cast(e.type, _resolve(e.operand, tensor_names, param_names))
    if isinstance(e, ir.Select):
        return ir.Select(_resolve(e.cond, tensor_names, param_names),
                         _resolve(e.on_true, tensor_names, param_names),
                         _resolve(e.on_false, tensor_names, param_names))
    if isinstance(e, ir.Call):
        return ir.Call(e.fn, tuple(_resolve(a, tensor_names, param_names) for a in e.args))
    if isinstance(e, ir.Const):
        return e
    raise TypeError(f"unexpected node {e!r}")


def build_program(raw: RawProgram, overrides: dict | None = None) -> StencilProgram:
    """RawProgram -> validated StencilProgram.

    `overrides` mirrors the reference CLI-beats-DSL precedence
    (--unroll-factor / --iterate / --burst-width / --tile-size / --dram-*).
    """
    ov = overrides or {}
    if raw.name is None:
        raise ValueError("missing `kernel:` statement")
    if not raw.inputs:
        raise ValueError("missing `input` statement")
    rank = len(raw.inputs[0].tile_size)

    tensor_names = {i.name for i in raw.inputs} | {s.name for s in raw.stages}
    param_names = {p.name for p in raw.params}

    tensors: dict[str, Tensor] = {}
    for i, rinp in enumerate(raw.inputs):
        tile = ov.get("tile_size", rinp.tile_size)
        dram = ov.get("dram_in", rinp.dram)
        tensors[rinp.name] = Tensor(
            name=rinp.name, type=rinp.type, expr=None,
            dram=tuple(dram), tile_size=tuple(tile))
    for st in raw.stages:
        body = _resolve(st.expr, tensor_names, param_names)
        # normalize: shift refs so the stage's own anchor is zero
        # (reference: mutator.shift offset normalization)
        if any(a != 0 for a in st.anchor):
            body = ir.shift(body, tuple(-a for a in st.anchor))
        dram = ov.get("dram_out", st.dram) if st.kind == "output" else st.dram
        tensors[st.name] = Tensor(
            name=st.name, type=st.type, expr=body,
            dram=tuple(dram), is_output=(st.kind == "output"))

    params = {
        p.name: Param(p.name, p.type, p.shape, p.dup, p.partition)
        for p in raw.params
    }

    return StencilProgram(
        name=raw.name,
        tensors=tensors,
        params=params,
        rank=rank,
        burst_width=int(ov.get("burst_width", raw.burst_width)),
        iterate=int(ov.get("iterate", raw.iterate)),
        unroll_factor=int(ov.get("unroll_factor", raw.unroll_factor)),
        border=str(ov.get("border", raw.border)),
        cluster=str(ov.get("cluster", raw.cluster)),
    )


def parse(text: str, overrides: dict | None = None) -> StencilProgram:
    """Parse `.soda` source text into a validated StencilProgram."""
    import lark

    try:
        raw = parse_raw(text)
    except lark.exceptions.VisitError as e:
        # unwrap semantic errors raised inside tree transforms (e.g. the
        # unsupported-integer-width rejection) so callers/tests see the
        # typed ValueError, not lark's wrapper
        if isinstance(e.orig_exc, ValueError):
            raise e.orig_exc from None
        raise
    except lark.exceptions.UnexpectedInput as e:
        lines = text.splitlines() or [""]
        # UnexpectedEOF (truncated input) carries line = column = -1:
        # point at the end of the source instead
        ln = e.line if 0 < e.line <= len(lines) else len(lines)
        col = e.column if e.column > 0 else len(lines[ln - 1]) + 1
        raise ValueError(
            f".soda syntax error at line {ln}, column {col}:\n"
            f"  {lines[ln - 1]}\n  {' ' * max(col - 1, 0)}^") from e
    return build_program(raw, overrides)


def parse_file(path: str | pathlib.Path, overrides: dict | None = None) -> StencilProgram:
    return parse(pathlib.Path(path).read_text(), overrides)
