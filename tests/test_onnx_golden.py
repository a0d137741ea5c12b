"""Spec-sourced golden fixtures for every op the ONNX emitter produces.

VERDICT r2 "What's missing" #3: the exported bytes were executed only by the
in-house numpy evaluator, so emitter and evaluator could share a spec
misconception and bytes-parity would still pass. These tests close that gap
from the spec side: each op gets a single-node ModelProto built through
``onnx_proto`` and executed from BYTES by ``onnx_runtime.run_model``, and the
expected outputs are HAND-COMPUTED LITERALS derived from the ONNX opset-13
operator spec (https://onnx.ai/onnx/operators/) — never recomputed with numpy
in the test, so a mistake shared by emitter and evaluator cannot hide here.

The fixtures pin exactly the trap semantics the verdict named:
- Conv ``pads`` ordering [x1_begin, x2_begin, x1_end, x2_end] = [t, l, b, r]
  (asymmetric case distinguishes it from every other ordering), group conv,
  dilations, strides;
- AveragePool ``count_include_pad=1`` (what the emitter sets — the spec
  default is 0) and MaxPool's -inf padding;
- Slice's INT64_MIN end sentinel with negative steps, negative starts;
- Pad's split begin/end layout and constant value input;
- ReduceSum axes-as-input (opset 13) with keepdims both ways, negative axes;
- ArgMax first-index tie-breaking (select_last_index default 0);
- Cast's truncate-toward-zero float->int rule.

Reference parity target: export_model_onnx.py:32-46 (opset 13 artifact).
"""

import math

import numpy as np
import pytest

import skinjax.serve.onnx_proto as P
from skinjax.serve.onnx_runtime import run_model

INT64_MIN = np.iinfo(np.int64).min


def run_op(op, feeds, inits=None, attrs=None, n_out=1):
    """Build a single-node opset-13 model and execute its serialized bytes."""
    inits = dict(inits or {})
    attrs = dict(attrs or {})
    in_names = list(feeds) + list(inits)
    out_names = [f"out{k}" for k in range(n_out)]
    node = P.node(op, in_names, out_names, name="n0", **attrs)
    graph = P.graph(
        nodes=[node],
        name="golden",
        inputs=[P.value_info(k, P.NP_TO_ONNX[np.asarray(v).dtype],
                             np.asarray(v).shape) for k, v in feeds.items()],
        outputs=[P.value_info(o, P.F32, ()) for o in out_names],
        initializers=[P.tensor_proto(k, np.asarray(v))
                      for k, v in inits.items()],
    )
    data = P.model(graph)
    res = run_model(data, {k: np.asarray(v) for k, v in feeds.items()},
                    outputs=out_names)
    return res["out0"] if n_out == 1 else [res[o] for o in out_names]


def check(got, want, **kw):
    want = np.asarray(want)
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, **kw)


f32 = lambda x: np.asarray(x, np.float32)
i64 = lambda x: np.asarray(x, np.int64)


# -- Conv ---------------------------------------------------------------------

X44 = f32(np.arange(16).reshape(1, 1, 4, 4))


class TestConv:
    def test_3x3_ones_symmetric_pad(self):
        # 3x3 neighborhood sums over [0..15] with a zero border (by hand)
        w = f32(np.ones((1, 1, 3, 3)))
        got = run_op("Conv", {"x": X44, "w": w},
                     attrs=dict(kernel_shape=[3, 3], strides=[1, 1],
                                pads=[1, 1, 1, 1], dilations=[1, 1], group=1))
        check(got, f32([[[[10, 18, 24, 18],
                          [27, 45, 54, 39],
                          [51, 81, 90, 63],
                          [42, 66, 72, 50]]]]))

    def test_asymmetric_pads_order_t_l_b_r(self):
        # pads = [x1_begin, x2_begin, x1_end, x2_end] = [top, left, bottom,
        # right]. [1, 0, 0, 1] pads one zero row ON TOP and one zero column
        # ON THE RIGHT; any other ordering changes the literals below.
        w = f32(np.ones((1, 1, 2, 2)))
        got = run_op("Conv", {"x": X44, "w": w},
                     attrs=dict(kernel_shape=[2, 2], strides=[1, 1],
                                pads=[1, 0, 0, 1], dilations=[1, 1], group=1))
        check(got, f32([[[[1, 3, 5, 3],
                          [10, 14, 18, 10],
                          [26, 30, 34, 18],
                          [42, 46, 50, 26]]]]))

    def test_group_conv(self):
        x = f32([[[[1, 2], [3, 4]], [[10, 20], [30, 40]]]])  # (1,2,2,2)
        w = f32([[[[2.0]]], [[[3.0]]]])  # (2,1,1,1), group=2
        got = run_op("Conv", {"x": x, "w": w},
                     attrs=dict(kernel_shape=[1, 1], strides=[1, 1],
                                pads=[0, 0, 0, 0], dilations=[1, 1], group=2))
        check(got, f32([[[[2, 4], [6, 8]], [[30, 60], [90, 120]]]]))

    def test_dilation(self):
        x = f32(np.arange(25).reshape(1, 1, 5, 5))
        w = f32(np.ones((1, 1, 2, 2)))
        got = run_op("Conv", {"x": x, "w": w},
                     attrs=dict(kernel_shape=[2, 2], strides=[1, 1],
                                pads=[0, 0, 0, 0], dilations=[2, 2], group=1))
        # out[i][j] = x[i][j] + x[i][j+2] + x[i+2][j] + x[i+2][j+2]
        check(got, f32([[[[24, 28, 32], [44, 48, 52], [64, 68, 72]]]]))

    def test_stride(self):
        w = f32(np.ones((1, 1, 2, 2)))
        got = run_op("Conv", {"x": X44, "w": w},
                     attrs=dict(kernel_shape=[2, 2], strides=[2, 2],
                                pads=[0, 0, 0, 0], dilations=[1, 1], group=1))
        check(got, f32([[[[10, 18], [42, 50]]]]))

    def test_attribute_defaults(self):
        # spec defaults: strides 1, pads 0, dilations 1, group 1
        w = f32(np.ones((1, 1, 2, 2)))
        got = run_op("Conv", {"x": X44, "w": w},
                     attrs=dict(kernel_shape=[2, 2]))
        check(got, f32([[[[10, 14, 18], [26, 30, 34], [42, 46, 50]]]]))


# -- Pooling ------------------------------------------------------------------

class TestPool:
    def test_maxpool(self):
        got = run_op("MaxPool", {"x": X44},
                     attrs=dict(kernel_shape=[2, 2], strides=[2, 2]))
        check(got, f32([[[[5, 7], [13, 15]]]]))

    def test_maxpool_pad_is_neg_inf(self):
        # padded cells must never win the max (spec: pad with -inf, i.e.
        # ignore) — with pads=1 and stride 2 every window holds exactly one
        # real element, so the output IS the input
        x = f32([[[[1, 2], [3, 4]]]])
        got = run_op("MaxPool", {"x": x},
                     attrs=dict(kernel_shape=[2, 2], strides=[2, 2],
                                pads=[1, 1, 1, 1]))
        check(got, f32([[[[1, 2], [3, 4]]]]))

    def test_avgpool_count_include_pad_1(self):
        # the emitter always sets count_include_pad=1 (padded zeros COUNT in
        # the denominator) so that Mul-by-window-size recovers the exact
        # reduce_window_sum — these literals divide by 4 in every window
        x = f32([[[[1, 2], [3, 4]]]])
        got = run_op("AveragePool", {"x": x},
                     attrs=dict(kernel_shape=[2, 2], strides=[1, 1],
                                pads=[1, 1, 1, 1], count_include_pad=1))
        check(got, f32([[[[0.25, 0.75, 0.5],
                          [1.0, 2.5, 1.5],
                          [0.75, 1.75, 1.0]]]]))


# -- Shape / indexing ---------------------------------------------------------

class TestShapeOps:
    def test_slice_basic(self):
        got = run_op("Slice", {"x": f32([0, 1, 2, 3, 4])},
                     inits=dict(starts=i64([1]), ends=i64([4]),
                                axes=i64([0]), steps=i64([1])))
        check(got, f32([1, 2, 3]))

    def test_slice_int64min_sentinel_negative_step(self):
        # spec: to slice through the beginning with a negative step, ends
        # must be INT64_MIN — [3, 2, 1, 0], not [3, 2, 1]
        got = run_op("Slice", {"x": f32([0, 1, 2, 3, 4])},
                     inits=dict(starts=i64([3]), ends=i64([INT64_MIN]),
                                axes=i64([0]), steps=i64([-1])))
        check(got, f32([3, 2, 1, 0]))

    def test_slice_negative_start(self):
        got = run_op("Slice", {"x": f32([0, 1, 2, 3, 4])},
                     inits=dict(starts=i64([-2]), ends=i64([5]),
                                axes=i64([0]), steps=i64([1])))
        check(got, f32([3, 4]))

    def test_pad_layout_and_value(self):
        # pads = [x1_begin, x2_begin, x1_end, x2_end]: [0, 1, 1, 0] adds one
        # column on the LEFT and one row on the BOTTOM
        got = run_op("Pad", {"x": f32([[1, 2], [3, 4]])},
                     inits=dict(pads=i64([0, 1, 1, 0]), value=f32(5.0)))
        check(got, f32([[5, 1, 2], [5, 3, 4], [5, 5, 5]]))

    def test_pad_default_zero(self):
        got = run_op("Pad", {"x": f32([[1.0]])},
                     inits=dict(pads=i64([1, 0, 0, 1])))
        check(got, f32([[0, 0], [1, 0]]))

    def test_reshape(self):
        got = run_op("Reshape", {"x": f32([0, 1, 2, 3, 4, 5])},
                     inits=dict(shape=i64([2, 3])))
        check(got, f32([[0, 1, 2], [3, 4, 5]]))

    def test_reshape_minus_one(self):
        got = run_op("Reshape", {"x": f32([0, 1, 2, 3, 4, 5])},
                     inits=dict(shape=i64([-1, 2])))
        check(got, f32([[0, 1], [2, 3], [4, 5]]))

    def test_transpose(self):
        got = run_op("Transpose", {"x": f32([[1, 2, 3], [4, 5, 6]])},
                     attrs=dict(perm=[1, 0]))
        check(got, f32([[1, 4], [2, 5], [3, 6]]))

    def test_expand_same_rank(self):
        got = run_op("Expand", {"x": f32([[1, 2]])},
                     inits=dict(shape=i64([3, 2])))
        check(got, f32([[1, 2], [1, 2], [1, 2]]))

    def test_expand_rank_raising(self):
        got = run_op("Expand", {"x": f32([1, 2])},
                     inits=dict(shape=i64([2, 2, 2])))
        check(got, f32([[[1, 2], [1, 2]], [[1, 2], [1, 2]]]))

    def test_concat(self):
        got = run_op("Concat",
                     {"a": f32([[1, 2]]), "b": f32([[3, 4]])},
                     attrs=dict(axis=0))
        check(got, f32([[1, 2], [3, 4]]))

    def test_concat_negative_axis(self):
        got = run_op("Concat",
                     {"a": f32([[1], [2]]), "b": f32([[3], [4]])},
                     attrs=dict(axis=-1))
        check(got, f32([[1, 3], [2, 4]]))

    def test_gather_axis0(self):
        # ONNX spec: output[i..., j...] = data[indices[i...], j...]
        got = run_op("Gather",
                     {"x": f32([[1, 2], [3, 4], [5, 6]])},
                     inits=dict(idx=i64([[2, 0], [1, 1]])),
                     attrs=dict(axis=0))
        check(got, f32([[[5, 6], [1, 2]], [[3, 4], [3, 4]]]))

    def test_gather_axis1(self):
        got = run_op("Gather",
                     {"x": f32([[1, 2, 3], [4, 5, 6]])},
                     inits=dict(idx=i64([2, 0])),
                     attrs=dict(axis=1))
        check(got, f32([[3, 1], [6, 4]]))


# -- Reductions ---------------------------------------------------------------

class TestReduce:
    def test_reducesum_axes_as_input_keepdims(self):
        got = run_op("ReduceSum", {"x": f32([[1, 2, 3], [4, 5, 6]])},
                     inits=dict(axes=i64([1])), attrs=dict(keepdims=1))
        check(got, f32([[6], [15]]))

    def test_reducesum_no_keepdims(self):
        got = run_op("ReduceSum", {"x": f32([[1, 2, 3], [4, 5, 6]])},
                     inits=dict(axes=i64([1])), attrs=dict(keepdims=0))
        check(got, f32([6, 15]))

    def test_reducesum_negative_axis(self):
        got = run_op("ReduceSum", {"x": f32([[1, 2, 3], [4, 5, 6]])},
                     inits=dict(axes=i64([-1])), attrs=dict(keepdims=0))
        check(got, f32([6, 15]))

    def test_reducemax_axes_attribute(self):
        # ReduceMax still takes axes as an ATTRIBUTE at opset 13 (it moves
        # to an input only at opset 18)
        got = run_op("ReduceMax", {"x": f32([[1, 5], [7, 3]])},
                     attrs=dict(axes=[0], keepdims=0))
        check(got, f32([7, 5]))

    def test_reducemin_axes_attribute(self):
        got = run_op("ReduceMin", {"x": f32([[1, 5], [7, 3]])},
                     attrs=dict(axes=[1], keepdims=1))
        check(got, f32([[1], [3]]))

    def test_argmax_first_index_ties(self):
        # select_last_index defaults to 0: ties resolve to the FIRST index
        got = run_op("ArgMax", {"x": f32([[1, 3, 3], [2, 1, 0]])},
                     attrs=dict(axis=1, keepdims=0))
        assert got.dtype == np.int64
        check(got, i64([1, 0]))

    def test_argmax_keepdims(self):
        got = run_op("ArgMax", {"x": f32([[1, 3, 3], [2, 1, 0]])},
                     attrs=dict(axis=1, keepdims=1))
        check(got, i64([[1], [0]]))


# -- Matmul -------------------------------------------------------------------

class TestMatMul:
    def test_2d(self):
        got = run_op("MatMul", {"a": f32([[1, 2, 3], [4, 5, 6]]),
                                "b": f32([[7, 8], [9, 10], [11, 12]])})
        check(got, f32([[58, 64], [139, 154]]))

    def test_batched_broadcast(self):
        # (2,2,2) @ (2,2): the 2-D rhs broadcasts across the batch dim
        a = f32([[[1, 0], [0, 1]], [[2, 0], [0, 2]]])
        b = f32([[1, 2], [3, 4]])
        got = run_op("MatMul", {"a": a, "b": b})
        check(got, f32([[[1, 2], [3, 4]], [[2, 4], [6, 8]]]))


# -- Elementwise --------------------------------------------------------------

class TestElementwise:
    def test_add_broadcast(self):
        got = run_op("Add", {"a": f32([[1, 2], [3, 4]]), "b": f32([10, 20])})
        check(got, f32([[11, 22], [13, 24]]))

    def test_sub(self):
        got = run_op("Sub", {"a": f32([5, 3]), "b": f32([2, 4])})
        check(got, f32([3, -1]))

    def test_mul(self):
        got = run_op("Mul", {"a": f32([[2], [3]]), "b": f32([[4, 5]])})
        check(got, f32([[8, 10], [12, 15]]))

    def test_div(self):
        got = run_op("Div", {"a": f32([1, 3]), "b": f32([4, 2])})
        check(got, f32([0.25, 1.5]))

    def test_pow(self):
        got = run_op("Pow", {"a": f32([2, 3]), "b": f32([3, 2])})
        check(got, f32([8, 9]))

    def test_max_min(self):
        assert run_op("Max", {"a": f32([1, 5]), "b": f32([3, 2])}).tolist() \
            == [3, 5]
        assert run_op("Min", {"a": f32([1, 5]), "b": f32([3, 2])}).tolist() \
            == [1, 2]

    def test_neg_abs_sign_floor(self):
        check(run_op("Neg", {"x": f32([1, -2])}), f32([-1, 2]))
        check(run_op("Abs", {"x": f32([-2, 3])}), f32([2, 3]))
        check(run_op("Sign", {"x": f32([-5, 0, 7])}), f32([-1, 0, 1]))
        # Floor rounds toward -inf, NOT toward zero
        check(run_op("Floor", {"x": f32([-1.5, 1.5])}), f32([-2, 1]))

    def test_sqrt_reciprocal(self):
        check(run_op("Sqrt", {"x": f32([4, 9])}), f32([2, 3]))
        check(run_op("Reciprocal", {"x": f32([2, 4])}), f32([0.5, 0.25]))

    def test_exp_log(self):
        check(run_op("Exp", {"x": f32([0.0])}), f32([1.0]))
        check(run_op("Log", {"x": f32([1.0, math.e])}), f32([0.0, 1.0]),
              rtol=1e-6)

    def test_tanh_sigmoid_erf(self):
        # literals from the mathematical definitions, not recomputed
        check(run_op("Tanh", {"x": f32([0.0, 1.0])}),
              f32([0.0, 0.7615941559557649]), rtol=1e-6)
        check(run_op("Sigmoid", {"x": f32([0.0, 1.0])}),
              f32([0.5, 0.7310585786300049]), rtol=1e-6)
        check(run_op("Erf", {"x": f32([0.0, 1.0])}),
              f32([0.0, 0.8427007929497149]), rtol=1e-6)

    def test_cast_truncates_toward_zero(self):
        got = run_op("Cast", {"x": f32([1.7, -1.7])}, attrs=dict(to=P.I64))
        assert got.dtype == np.int64
        check(got, i64([1, -1]))

    def test_cast_to_bool_and_back(self):
        got = run_op("Cast", {"x": f32([0.0, 1.5, -0.5])},
                     attrs=dict(to=P.BOOL))
        assert got.dtype == np.bool_
        assert got.tolist() == [False, True, True]
        got = run_op("Cast", {"x": np.asarray([True, False])},
                     attrs=dict(to=P.F32))
        check(got, f32([1.0, 0.0]))

    def test_compare_and_not(self):
        assert run_op("Equal", {"a": f32([1, 2]), "b": f32([1, 3])}).tolist() \
            == [True, False]
        assert run_op("Less", {"a": f32([1, 4]), "b": f32([2, 3])}).tolist() \
            == [True, False]
        assert run_op("Greater", {"a": f32([1, 4]),
                                  "b": f32([2, 3])}).tolist() == [False, True]
        assert run_op("Not", {"x": np.asarray([True, False])}).tolist() \
            == [False, True]

    def test_where_broadcast(self):
        got = run_op("Where", {"c": np.asarray([[True], [False]]),
                               "a": f32([[1, 2], [3, 4]]),
                               "b": f32(9.0)})
        check(got, f32([[1, 2], [9, 9]]))

    def test_identity(self):
        check(run_op("Identity", {"x": f32([[1, 2]])}), f32([[1, 2]]))


# -- Serialized structure -------------------------------------------------------

class TestModelStructure:
    def test_header_fields(self):
        g = P.graph([P.node("Identity", ["x"], ["out0"], name="n0")],
                    "golden", [P.value_info("x", P.F32, (1,))],
                    [P.value_info("out0", P.F32, (1,))], [])
        data = P.model(g)
        fields = P.parse_message(data)
        assert fields[1][0] == 8  # ir_version 8 (required for opset 13)
        opset = P.parse_message(fields[8][0])
        assert opset[2][0] == 13
        assert fields[2][0] == b"skinjax"  # producer_name
