"""Minimal numpy evaluator for skinjax-emitted ONNX models.

No ``onnxruntime`` exists in this image, so the export parity test executes
the serialized ONNX BYTES here: parse with onnx_proto.OnnxModel, run the
graph with pure-numpy op implementations (Conv via im2col), and compare
logits against ``model.apply``. Covers exactly the op set
``onnx_export.export_onnx`` emits (opset 13 semantics).
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

from skinjax.serve.onnx_proto import ONNX_TO_NP, OnnxModel


def _conv2d(x, w, strides, pads, group, dilations):
    # x: (N, C, H, W); w: (O, C/g, kh, kw); pads [t, l, b, r]
    N, C, H, W = x.shape
    O, Cg, kh, kw = w.shape
    sh, sw = strides
    dh, dw = dilations
    t, l, bdown, r = pads
    x = np.pad(x, ((0, 0), (0, 0), (t, bdown), (l, r)))
    Hp, Wp = x.shape[2], x.shape[3]
    eh, ew = (kh - 1) * dh + 1, (kw - 1) * dw + 1
    Ho, Wo = (Hp - eh) // sh + 1, (Wp - ew) // sw + 1
    out = np.zeros((N, O, Ho, Wo), np.float32)
    og = O // group
    cg = C // group
    for g in range(group):
        xg = x[:, g * cg:(g + 1) * cg]
        wg = w[g * og:(g + 1) * og]
        cols = np.zeros((N, cg * kh * kw, Ho * Wo), np.float32)
        idx = 0
        for ky in range(kh):
            for kx in range(kw):
                patch = xg[:, :, ky * dh:ky * dh + Ho * sh:sh,
                           kx * dw:kx * dw + Wo * sw:sw]
                cols[:, idx * cg:(idx + 1) * cg] = patch.reshape(N, cg, -1)
                idx += 1
        wmat = wg.transpose(1, 2, 3, 0).reshape(-1, og)
        # cols layout: [tap, channel] major per construction above; build the
        # matching weight layout: for tap (ky,kx) block rows are channels
        wtap = np.concatenate(
            [wg[:, :, ky, kx].T for ky in range(kh) for kx in range(kw)],
            axis=0,
        )  # (kh*kw*cg, og)
        res = np.einsum("nir,io->nor", cols, wtap)
        out[:, g * og:(g + 1) * og] = res.reshape(N, og, Ho, Wo)
    return out


def _pool2d(x, kernel, strides, pads, mode):
    N, C, H, W = x.shape
    kh, kw = kernel
    sh, sw = strides
    t, l, bdown, r = pads
    fill = -np.inf if mode == "max" else 0.0
    x = np.pad(x, ((0, 0), (0, 0), (t, bdown), (l, r)),
               constant_values=fill)
    Hp, Wp = x.shape[2], x.shape[3]
    Ho, Wo = (Hp - kh) // sh + 1, (Wp - kw) // sw + 1
    stack = np.stack([
        x[:, :, ky:ky + Ho * sh:sh, kx:kx + Wo * sw:sw]
        for ky in range(kh) for kx in range(kw)
    ])
    if mode == "max":
        return stack.max(axis=0)
    return stack.mean(axis=0)


def run_model(data: bytes, feeds: Dict[str, np.ndarray],
              outputs: Sequence[str] = None) -> Dict[str, np.ndarray]:
    m = OnnxModel(data)
    env: Dict[str, np.ndarray] = dict(m.initializers)
    env.update({k: np.asarray(v) for k, v in feeds.items()})

    for n in m.nodes:
        i = [env[x] for x in n.inputs]
        a = n.attrs
        op = n.op_type
        if op == "Identity":
            r = i[0]
        elif op == "Add":
            r = i[0] + i[1]
        elif op == "Sub":
            r = i[0] - i[1]
        elif op == "Mul":
            r = i[0] * i[1]
        elif op == "Div":
            r = i[0] / i[1]
        elif op == "Max":
            r = np.maximum(i[0], i[1])
        elif op == "Min":
            r = np.minimum(i[0], i[1])
        elif op == "Pow":
            r = np.power(i[0], i[1])
        elif op == "Neg":
            r = -i[0]
        elif op == "Exp":
            r = np.exp(i[0])
        elif op == "Log":
            r = np.log(i[0])
        elif op == "Tanh":
            r = np.tanh(i[0])
        elif op == "Sigmoid":
            r = 1.0 / (1.0 + np.exp(-i[0]))
        elif op == "Sqrt":
            r = np.sqrt(i[0])
        elif op == "Reciprocal":
            r = 1.0 / i[0]
        elif op == "Abs":
            r = np.abs(i[0])
        elif op == "Sign":
            r = np.sign(i[0])
        elif op == "Floor":
            r = np.floor(i[0])
        elif op == "Erf":
            from math import erf
            r = np.vectorize(erf)(i[0]).astype(np.float32)
        elif op == "Not":
            r = ~i[0]
        elif op == "Equal":
            r = i[0] == i[1]
        elif op == "Less":
            r = i[0] < i[1]
        elif op == "Greater":
            r = i[0] > i[1]
        elif op == "Where":
            r = np.where(i[0], i[1], i[2])
        elif op == "Cast":
            r = i[0].astype(ONNX_TO_NP[a["to"]])
        elif op == "Reshape":
            r = i[0].reshape([int(d) for d in i[1]])
        elif op == "Transpose":
            r = i[0].transpose(a["perm"])
        elif op == "Expand":
            r = np.broadcast_to(i[0], [int(d) for d in i[1]]).copy()
        elif op == "Concat":
            r = np.concatenate(i, axis=a["axis"])
        elif op == "Gather":
            r = np.take(i[0], i[1].astype(np.int64), axis=a.get("axis", 0))
        elif op == "Slice":
            starts, ends, axes, steps = (list(map(int, t)) for t in i[1:5])
            sl = [slice(None)] * i[0].ndim
            imin = np.iinfo(np.int64).min
            for s, e, ax, st in zip(starts, ends, axes, steps):
                sl[ax] = slice(s, None if e == imin else e, st)
            r = i[0][tuple(sl)]
        elif op == "Pad":
            pads = [int(d) for d in i[1]]
            nd = i[0].ndim
            cfg = [(pads[k], pads[k + nd]) for k in range(nd)]
            cval = float(np.asarray(i[2]).reshape(-1)[0]) if len(i) > 2 else 0.0
            r = np.pad(i[0], cfg, constant_values=cval)
        elif op == "ReduceSum":
            axes = tuple(int(d) for d in i[1])
            r = i[0].sum(axis=axes, keepdims=bool(a.get("keepdims", 1)))
        elif op == "ReduceMax":
            r = i[0].max(axis=tuple(a["axes"]),
                         keepdims=bool(a.get("keepdims", 1)))
        elif op == "ReduceMin":
            r = i[0].min(axis=tuple(a["axes"]),
                         keepdims=bool(a.get("keepdims", 1)))
        elif op == "ArgMax":
            r = i[0].argmax(axis=a["axis"]).astype(np.int64)
            if a.get("keepdims", 1):
                r = np.expand_dims(r, a["axis"])
        elif op == "MatMul":
            r = np.matmul(i[0].astype(np.float32), i[1].astype(np.float32))
        elif op == "Conv":
            r = _conv2d(i[0].astype(np.float32), i[1].astype(np.float32),
                        a.get("strides", [1, 1]), a.get("pads", [0, 0, 0, 0]),
                        a.get("group", 1), a.get("dilations", [1, 1]))
        elif op == "MaxPool":
            r = _pool2d(i[0], a["kernel_shape"], a["strides"],
                        a.get("pads", [0, 0, 0, 0]), "max")
        elif op == "AveragePool":
            r = _pool2d(i[0], a["kernel_shape"], a["strides"],
                        a.get("pads", [0, 0, 0, 0]), "avg")
        else:
            raise NotImplementedError(f"onnx_runtime: op {op}")
        for oname in n.outputs:
            env[oname] = np.asarray(r)

    wanted = outputs or [o["name"] for o in m.outputs]
    return {k: env[k] for k in wanted}
