"""jaxpr → ONNX (opset 13) exporter.

Parity target: the reference's ``torch.onnx.export`` path
(export_model_onnx.py:32-46 — opset 13, dynamic batch, ``image`` +
``text_metadata`` inputs, ``logits`` output). skinjax traces the inference
function to a jaxpr (weights close over as constants) and maps each lax
primitive to ONNX nodes; NHWC convs/pools are bridged to ONNX's NCHW with
transposes, and HWIO kernels are re-laid to OIHW at export time.

Dynamic batch: jax shapes are static, so the function is traced TWICE (batch
1 and batch 2) and every emitted shape constant is diffed between the traces
— dims that scale with batch become ``-1`` in Reshape targets and ``1``
(broadcast-at-consumer) in Expand targets, exactly the trick torch.onnx uses
for its dynamic axes.

No ``onnx`` package exists in this image — serialization goes through the
native writer in ``onnx_proto.py`` and tests execute the emitted BYTES with
the numpy evaluator in ``onnx_runtime.py`` against ``model.apply`` logits.
"""

from __future__ import annotations

import itertools
import os
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import numpy as np

from skinjax.serve import onnx_proto as P


class _Builder:
    def __init__(self):
        self.nodes: List[bytes] = []
        self.initializers: List[bytes] = []
        self._ctr = itertools.count()
        self._const_cache: Dict[Any, str] = {}

    def fresh(self, hint: str = "t") -> str:
        return f"{hint}_{next(self._ctr)}"

    def add_node(self, op: str, inputs: Sequence[str], n_out: int = 1,
                 hint: Optional[str] = None, **attrs) -> List[str]:
        outs = [self.fresh(hint or op.lower()) for _ in range(n_out)]
        self.nodes.append(P.node(op, inputs, outs, name=outs[0], **attrs))
        return outs

    def const(self, arr: np.ndarray, hint: str = "c") -> str:
        arr = np.asarray(arr)
        key = (arr.dtype.str, arr.shape, arr.tobytes())
        if key in self._const_cache:
            return self._const_cache[key]
        name = self.fresh(hint)
        self.initializers.append(P.tensor_proto(name, arr))
        self._const_cache[key] = name
        return name

    def ints(self, vals: Sequence[int], hint: str = "ints") -> str:
        return self.const(np.asarray(list(vals), np.int64), hint)

    def reshape_target(self, s1: Sequence[int], s2: Sequence[int]) -> str:
        """Reshape shape const; batch-scaled dims (differing between the two
        traces) become -1 (ONNX infers them at runtime)."""
        out = []
        n_dyn = 0
        for a, c in zip(s1, s2):
            if a != c:
                out.append(-1)
                n_dyn += 1
            else:
                out.append(int(a))
        if n_dyn > 1:
            raise NotImplementedError(
                f"reshape with {n_dyn} batch-scaled dims: {s1} vs {s2}"
            )
        return self.ints(out, "shape")

    def expand_target(self, s1: Sequence[int], s2: Sequence[int]) -> str:
        """Expand shape const; batch-scaled dims become 1 (the consumer's
        numpy-style broadcasting supplies them)."""
        return self.ints(
            [1 if a != c else int(a) for a, c in zip(s1, s2)], "shape"
        )


def _np(x) -> np.ndarray:
    arr = np.asarray(x)
    if arr.dtype == np.float64:
        arr = arr.astype(np.float32)
    if arr.dtype.name == "bfloat16":
        arr = arr.astype(np.float32)
    return arr


def _to_nchw(b: _Builder, name: str, rank: int = 4) -> str:
    return b.add_node("Transpose", [name], hint="nchw",
                      perm=[0, rank - 1] + list(range(1, rank - 1)))[0]


def _to_nhwc(b: _Builder, name: str, rank: int = 4) -> str:
    return b.add_node("Transpose", [name], hint="nhwc",
                      perm=[0] + list(range(2, rank)) + [1])[0]


def _shape(var) -> tuple:
    return tuple(int(d) for d in var.aval.shape)


def _convert_eqn(b: _Builder, eqn, eqn2, env: Dict, read: Callable) -> None:
    prim = eqn.primitive.name
    params = eqn.params

    def write(var, name):
        env[var] = name

    simple = {
        "add": "Add", "sub": "Sub", "mul": "Mul", "div": "Div",
        "max": "Max", "min": "Min", "pow": "Pow", "neg": "Neg",
        "exp": "Exp", "log": "Log", "tanh": "Tanh", "logistic": "Sigmoid",
        "sqrt": "Sqrt", "abs": "Abs", "sign": "Sign", "floor": "Floor",
        "erf": "Erf",
    }
    if prim in simple:
        ins = [read(v) for v in eqn.invars]
        write(eqn.outvars[0], b.add_node(simple[prim], ins)[0])
        return
    if prim == "square":
        x = read(eqn.invars[0])
        write(eqn.outvars[0], b.add_node("Mul", [x, x])[0])
        return
    if prim == "rsqrt":
        s = b.add_node("Sqrt", [read(eqn.invars[0])])[0]
        write(eqn.outvars[0], b.add_node("Reciprocal", [s])[0])
        return
    if prim == "erfc":
        # no ONNX Erfc: erfc(x) = 1 - erf(x) (exact-GELU lowers via erfc)
        e = b.add_node("Erf", [read(eqn.invars[0])])[0]
        one = b.const(np.asarray(1.0, np.float32))
        write(eqn.outvars[0], b.add_node("Sub", [one, e])[0])
        return
    if prim == "integer_pow":
        x = read(eqn.invars[0])
        y = int(params["y"])
        if y == 2:
            write(eqn.outvars[0], b.add_node("Mul", [x, x])[0])
        else:
            e = b.const(np.asarray(float(y), np.float32))
            write(eqn.outvars[0], b.add_node("Pow", [x, e])[0])
        return
    if prim in ("stop_gradient", "copy"):
        write(eqn.outvars[0], read(eqn.invars[0]))
        return
    if prim == "convert_element_type":
        dt = np.dtype(params["new_dtype"])
        if dt.name == "bfloat16":
            dt = np.dtype(np.float32)
        out = b.add_node("Cast", [read(eqn.invars[0])],
                         to=int(P.NP_TO_ONNX[dt]))[0]
        write(eqn.outvars[0], out)
        return
    if prim in ("reshape", "squeeze", "expand_dims"):
        shp = b.reshape_target(_shape(eqn.outvars[0]), _shape(eqn2.outvars[0]))
        write(eqn.outvars[0],
              b.add_node("Reshape", [read(eqn.invars[0]), shp])[0])
        return
    if prim == "transpose":
        write(eqn.outvars[0],
              b.add_node("Transpose", [read(eqn.invars[0])],
                         perm=[int(p) for p in params["permutation"]])[0])
        return
    if prim == "broadcast_in_dim":
        in1, in2 = _shape(eqn.invars[0]), _shape(eqn2.invars[0])
        t1, t2 = _shape(eqn.outvars[0]), _shape(eqn2.outvars[0])
        bdims = params["broadcast_dimensions"]
        interim1 = [1] * len(t1)
        interim2 = [1] * len(t2)
        for src_i, dst_i in enumerate(bdims):
            interim1[dst_i] = in1[src_i]
            interim2[dst_i] = in2[src_i]
        x = read(eqn.invars[0])
        if tuple(interim1) != in1:
            x = b.add_node("Reshape",
                           [x, b.reshape_target(interim1, interim2)])[0]
        if tuple(interim1) != t1:
            x = b.add_node("Expand", [x, b.expand_target(t1, t2)])[0]
        write(eqn.outvars[0], x)
        return
    if prim == "concatenate":
        write(eqn.outvars[0],
              b.add_node("Concat", [read(v) for v in eqn.invars],
                         axis=int(params["dimension"]))[0])
        return
    if prim == "slice":
        starts = [int(s) for s in params["start_indices"]]
        ends = [int(s) for s in params["limit_indices"]]
        # a slice that spans a batch-scaled dim entirely must stay open-ended
        ends2 = [int(s) for s in eqn2.params["limit_indices"]]
        ends = [e if e == e2 else np.iinfo(np.int64).max
                for e, e2 in zip(ends, ends2)]
        strides = params["strides"] or [1] * len(starts)
        out = b.add_node("Slice", [
            read(eqn.invars[0]), b.ints(starts, "starts"),
            b.ints(ends, "ends"), b.ints(range(len(starts)), "axes"),
            b.ints([int(s) for s in strides], "steps"),
        ])[0]
        write(eqn.outvars[0], out)
        return
    if prim == "rev":
        x = read(eqn.invars[0])
        dims = [int(d) for d in params["dimensions"]]
        starts = b.ints([-1] * len(dims), "starts")
        ends = b.ints([np.iinfo(np.int64).min] * len(dims), "ends")
        out = b.add_node("Slice", [x, starts, ends, b.ints(dims, "axes"),
                                   b.ints([-1] * len(dims), "steps")])[0]
        write(eqn.outvars[0], out)
        return
    if prim == "pad":
        lo_hi_int = params["padding_config"]
        if any(i != 0 for (_, _, i) in lo_hi_int):
            raise NotImplementedError("interior padding")
        los = [int(l) for (l, _, _) in lo_hi_int]
        his = [int(h) for (_, h, _) in lo_hi_int]
        pads = b.ints(los + his, "pads")
        out = b.add_node("Pad", [read(eqn.invars[0]), pads,
                                 read(eqn.invars[1])], mode="constant")[0]
        write(eqn.outvars[0], out)
        return
    if prim == "select_n":
        cases = [read(v) for v in eqn.invars]
        if len(cases) != 3:
            raise NotImplementedError("select_n with >2 cases")
        pred, on_false, on_true = cases
        write(eqn.outvars[0],
              b.add_node("Where", [pred, on_true, on_false])[0])
        return
    cmp = {"eq": "Equal", "lt": "Less", "gt": "Greater"}
    if prim in cmp:
        write(eqn.outvars[0],
              b.add_node(cmp[prim], [read(v) for v in eqn.invars])[0])
        return
    if prim in ("ge", "le"):
        inner = "Less" if prim == "ge" else "Greater"
        o = b.add_node(inner, [read(v) for v in eqn.invars])[0]
        write(eqn.outvars[0], b.add_node("Not", [o])[0])
        return
    if prim == "reduce_sum":
        axes = b.ints([int(a) for a in params["axes"]], "axes")
        write(eqn.outvars[0],
              b.add_node("ReduceSum", [read(eqn.invars[0]), axes],
                         keepdims=0)[0])
        return
    if prim in ("reduce_max", "reduce_min"):
        op = "ReduceMax" if prim == "reduce_max" else "ReduceMin"
        write(eqn.outvars[0],
              b.add_node(op, [read(eqn.invars[0])],
                         axes=[int(a) for a in params["axes"]], keepdims=0)[0])
        return
    if prim == "argmax":
        out = b.add_node("ArgMax", [read(eqn.invars[0])],
                         axis=int(params["axes"][0]), keepdims=0)[0]
        write(eqn.outvars[0], out)
        return
    if prim == "dot_general":
        (lc, rc), (lb, rb) = params["dimension_numbers"]
        l1, r1 = _shape(eqn.invars[0]), _shape(eqn.invars[1])
        l2, r2 = _shape(eqn2.invars[0]), _shape(eqn2.invars[1])
        lfree = [i for i in range(len(l1)) if i not in lc and i not in lb]
        rfree = [i for i in range(len(r1)) if i not in rc and i not in rb]
        lperm = list(lb) + lfree + list(lc)
        rperm = list(rb) + list(rc) + rfree
        x = read(eqn.invars[0])
        y = read(eqn.invars[1])
        if lperm != list(range(len(l1))):
            x = b.add_node("Transpose", [x], perm=lperm)[0]
        if rperm != list(range(len(r1))):
            y = b.add_node("Transpose", [y], perm=rperm)[0]

        def dims(shape, idxs):
            return int(np.prod([shape[i] for i in idxs])) if idxs else 1

        mkl1 = [dims(l1, lb), dims(l1, lfree), dims(l1, lc)]
        mkl2 = [dims(l2, lb), dims(l2, lfree), dims(l2, lc)]
        nkr1 = [dims(r1, rb), dims(r1, rc), dims(r1, rfree)]
        nkr2 = [dims(r2, rb), dims(r2, rc), dims(r2, rfree)]
        x = b.add_node("Reshape", [x, b.reshape_target(mkl1, mkl2)])[0]
        y = b.add_node("Reshape", [y, b.reshape_target(nkr1, nkr2)])[0]
        mm = b.add_node("MatMul", [x, y])[0]
        out = b.add_node("Reshape", [
            mm, b.reshape_target(_shape(eqn.outvars[0]),
                                 _shape(eqn2.outvars[0])),
        ])[0]
        write(eqn.outvars[0], out)
        return
    if prim == "conv_general_dilated":
        dn = params["dimension_numbers"]
        if dn.lhs_spec != (0, 3, 1, 2) or dn.out_spec != (0, 3, 1, 2):
            raise NotImplementedError(f"conv layout {dn}")
        strides = [int(s) for s in params["window_strides"]]
        padding = params["padding"]
        rhs_dil = [int(d) for d in params.get("rhs_dilation") or (1, 1)]
        lhs_dil = params.get("lhs_dilation") or (1, 1)
        if any(d != 1 for d in lhs_dil):
            raise NotImplementedError("transposed conv")
        groups = int(params["feature_group_count"])
        x = _to_nchw(b, read(eqn.invars[0]))
        w = b.add_node("Transpose", [read(eqn.invars[1])],
                       perm=[3, 2, 0, 1])[0]  # HWIO -> OIHW
        pads = [int(padding[0][0]), int(padding[1][0]),
                int(padding[0][1]), int(padding[1][1])]
        kh, kw = (int(d) for d in eqn.invars[1].aval.shape[:2])
        conv = b.add_node("Conv", [x, w], strides=strides, pads=pads,
                          group=groups, dilations=rhs_dil,
                          kernel_shape=[kh, kw])[0]
        write(eqn.outvars[0], _to_nhwc(b, conv))
        return
    if prim in ("reduce_window_max", "reduce_window_sum"):
        wd = [int(d) for d in params["window_dimensions"]]
        ws = [int(s) for s in params["window_strides"]]
        pd = params["padding"]
        if wd[0] != 1 or wd[3] != 1:
            raise NotImplementedError(f"window over batch/channel: {wd}")
        x = _to_nchw(b, read(eqn.invars[0]))
        pads = [int(pd[1][0]), int(pd[2][0]), int(pd[1][1]), int(pd[2][1])]
        if prim == "reduce_window_max":
            pool = b.add_node("MaxPool", [x], kernel_shape=wd[1:3],
                              strides=ws[1:3], pads=pads)[0]
        else:
            pool = b.add_node("AveragePool", [x], kernel_shape=wd[1:3],
                              strides=ws[1:3], pads=pads,
                              count_include_pad=1)[0]
            cnt = b.const(np.asarray(float(wd[1] * wd[2]), np.float32))
            pool = b.add_node("Mul", [pool, cnt])[0]
        write(eqn.outvars[0], _to_nhwc(b, pool))
        return
    if prim == "split":
        axis = int(params["axis"])
        sizes = [int(s) for s in params["sizes"]]
        sizes2 = [int(s) for s in eqn2.params["sizes"]]
        if sizes != sizes2:
            raise NotImplementedError("split along a batch-scaled dim")
        xin = read(eqn.invars[0])
        off = 0
        for ov, sz in zip(eqn.outvars, sizes):
            out = b.add_node("Slice", [
                xin, b.ints([off], "starts"), b.ints([off + sz], "ends"),
                b.ints([axis], "axes"), b.ints([1], "steps"),
            ])[0]
            write(ov, out)
            off += sz
        return
    if prim == "iota":
        # no inputs: materialize as a constant initializer (shifted-window
        # mask construction uses broadcasted_iota over static shapes)
        shape = tuple(int(s) for s in params["shape"])
        if shape != tuple(int(s) for s in eqn2.params["shape"]):
            raise NotImplementedError("iota over a batch-scaled shape")
        dim = int(params["dimension"])
        dt = np.dtype(params["dtype"])
        if dt.name == "bfloat16":
            dt = np.dtype(np.float32)
        arr = np.arange(shape[dim], dtype=dt).reshape(
            [shape[d] if d == dim else 1 for d in range(len(shape))])
        write(eqn.outvars[0],
              b.const(np.ascontiguousarray(np.broadcast_to(arr, shape))))
        return
    if prim == "gather":
        # restricted to the single-axis take pattern (jnp.take(t, idx,
        # axis=a) — e.g. the Swin rel-pos bias table lookup): one indexed
        # dim with size-1 slices, full slices everywhere else -> ONNX
        # Gather(axis=a).
        dn = params["dimension_numbers"]
        op_shape = _shape(eqn.invars[0])
        slice_sizes = tuple(int(s) for s in params["slice_sizes"])
        smap = tuple(dn.start_index_map)
        collapsed = tuple(dn.collapsed_slice_dims)
        no_batch = (not getattr(dn, "operand_batching_dims", ())
                    and not getattr(dn, "start_indices_batching_dims", ()))
        idx_shape = _shape(eqn.invars[1])
        # jnp.take output layout: t.shape[:a] + idx.shape + t.shape[a+1:],
        # i.e. offset dims occupy [0, a) and [a+idx_ndim, out_rank) — any
        # other offset placement would make ONNX Gather's output a
        # transpose of the jax result
        idx_nd = max(len(idx_shape) - 1, 0)  # trailing index-vector dim
        out_rank = len(_shape(eqn.outvars[0]))
        take_offsets = (tuple(range(smap[0])) if smap else ()) + tuple(
            range((smap[0] if smap else 0) + idx_nd, out_rank))
        if (no_batch and len(smap) == 1 and collapsed == smap
                and slice_sizes[smap[0]] == 1
                and tuple(dn.offset_dims) == take_offsets
                and idx_shape == _shape(eqn2.invars[1])
                and all(slice_sizes[d] == op_shape[d]
                        for d in range(len(op_shape)) if d != smap[0])):
            axis = smap[0]
            # indices carry a trailing size-1 "index vector" dim: drop it
            idx = read(eqn.invars[1])
            if idx_shape and idx_shape[-1] == 1:
                shp = b.const(
                    np.asarray(idx_shape[:-1] or (1,), np.int64))
                idx = b.add_node("Reshape", [idx, shp])[0]
            idx = b.add_node("Cast", [idx], to=int(P.NP_TO_ONNX[
                np.dtype(np.int64)]))[0]
            out = b.add_node("Gather", [read(eqn.invars[0]), idx],
                             axis=axis)[0]
            # offset dims may need reordering only when the indexed axis is
            # not where ONNX Gather puts the index dims; the take pattern
            # keeps jax's output order identical to ONNX's
            write(eqn.outvars[0], out)
            return
        raise NotImplementedError(
            f"ONNX export: general gather unsupported (dn={dn}, "
            f"slice_sizes={slice_sizes})")
    if prim in ("pjit", "jit", "closed_call", "core_call", "remat",
                "checkpoint", "custom_jvp_call", "custom_vjp_call",
                "custom_jvp_call_jaxpr"):
        def unpack(p):
            inner = p.get("jaxpr") or p.get("call_jaxpr") or p.get("fun_jaxpr")
            if hasattr(inner, "jaxpr"):
                return inner.jaxpr, inner.consts
            return inner, p.get("consts", [])

        inner1, consts1 = unpack(params)
        inner2, _ = unpack(eqn2.params)
        inner_env: Dict = {}
        for cv, cval in zip(inner1.constvars, consts1):
            inner_env[cv] = b.const(_np(cval), "const")
        for iv, outer in zip(inner1.invars, eqn.invars):
            inner_env[iv] = read(outer)
        _convert_jaxpr(b, inner1, inner2, inner_env)
        for ov, inner_ov in zip(eqn.outvars, inner1.outvars):
            env[ov] = _read_var(b, inner_env, inner_ov)
        return
    raise NotImplementedError(f"ONNX export: unsupported primitive '{prim}'")


def _read_var(b: _Builder, env: Dict, var) -> str:
    from jax._src.core import Literal

    if isinstance(var, Literal):
        return b.const(_np(var.val), "lit")
    return env[var]


def _convert_jaxpr(b: _Builder, jaxpr, jaxpr2, env: Dict) -> None:
    assert len(jaxpr.eqns) == len(jaxpr2.eqns), "trace structures diverged"
    for eqn, eqn2 in zip(jaxpr.eqns, jaxpr2.eqns):
        _convert_eqn(b, eqn, eqn2, env, lambda v: _read_var(b, env, v))


def export_onnx(
    fn: Callable,
    example_args: Sequence,
    path: Optional[str] = None,
    input_names: Sequence[str] = ("image", "text_metadata"),
    output_names: Sequence[str] = ("logits",),
    dynamic_batch: bool = True,
) -> bytes:
    """Trace ``fn(*example_args)`` and serialize an opset-13 ONNX model.

    Weights must be closed over by ``fn`` (they become initializers).
    Matches /root/reference/src/scripts/others/export_model_onnx.py:32-46:
    named image/text_metadata inputs, logits output, dynamic batch dim.
    """
    # SKINJAX_EXPORT_COMPAT: modules that would trace to 2-axis gathers
    # (multi-axis roll / strided fancy indexing) switch to their
    # Slice/Concat forms while the exporter traces (transformer_zoo
    # _export_compat — identical math, emitter-expressible)
    prev_compat = os.environ.get("SKINJAX_EXPORT_COMPAT")
    os.environ["SKINJAX_EXPORT_COMPAT"] = "1"
    try:
        closed = jax.make_jaxpr(fn)(*example_args)
        if dynamic_batch:
            args2 = [np.concatenate([_np(a)] * 2, axis=0)
                     for a in example_args]
            closed2 = jax.make_jaxpr(fn)(*args2)
            if len(closed.jaxpr.eqns) != len(closed2.jaxpr.eqns):
                # B=1 traces can degenerate (broadcasts/squeezes elided —
                # ViT/CoaT CLS-token paths): re-base on the doubled batch so
                # both traces are structurally generic (B=2 vs B=4)
                example_args = args2
                closed = closed2
                args4 = [np.concatenate([_np(a)] * 2, axis=0)
                         for a in example_args]
                closed2 = jax.make_jaxpr(fn)(*args4)
        else:
            closed2 = closed
    finally:
        if prev_compat is None:
            os.environ.pop("SKINJAX_EXPORT_COMPAT", None)
        else:
            os.environ["SKINJAX_EXPORT_COMPAT"] = prev_compat
    jaxpr, jaxpr2 = closed.jaxpr, closed2.jaxpr
    b = _Builder()
    env: Dict = {}
    for cv, cval in zip(jaxpr.constvars, closed.consts):
        env[cv] = b.const(_np(cval), "w")
    graph_inputs = []
    for var, name, arg in zip(jaxpr.invars, input_names, example_args):
        env[var] = name
        arr = _np(arg)
        graph_inputs.append(P.value_info(
            name, P.NP_TO_ONNX[arr.dtype], arr.shape,
            dynamic_batch=dynamic_batch,
        ))
    _convert_jaxpr(b, jaxpr, jaxpr2, env)
    graph_outputs = []
    renames = []
    for var, name in zip(jaxpr.outvars, output_names):
        src = _read_var(b, env, var)
        renames.append(P.node("Identity", [src], [name], name=f"out_{name}"))
        aval = var.aval
        dt = np.dtype(aval.dtype)
        if dt.name == "bfloat16":
            dt = np.dtype(np.float32)
        graph_outputs.append(P.value_info(
            name, P.NP_TO_ONNX[dt], tuple(int(d) for d in aval.shape),
            dynamic_batch=dynamic_batch,
        ))
    g = P.graph(b.nodes + renames, "skinjax_inference", graph_inputs,
                graph_outputs, b.initializers)
    data = P.model(g, opset=13)
    if path:
        with open(path, "wb") as f:
            f.write(data)
    return data
