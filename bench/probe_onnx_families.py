"""Probe: which registered backbones export through the native ONNX
emitter + evaluate with parity. Prints one line per family."""
import os as _os, sys as _sys  # repo-root import shim (scripts live in bench/)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os
os.environ["SKINJAX_WINATTN"] = ""
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
from skinjax.models.backbones import create_backbone
from skinjax.serve.onnx_export import export_onnx
from skinjax.serve.onnx_runtime import run_model
import time, traceback

FAMILIES = ["vit_small_patch16_224", "caformer_s18", "coat_lite_small",
            "nextvit_small", "mvitv2_small", "resnet-50", "densenet169",
            "mobilenet-v2", "efficientnet-b0", "vgg16"]
x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 224, 224, 3)), jnp.float32)
for name in FAMILIES:
    t0 = time.time()
    try:
        bk, dim = create_backbone(name, common_dim=512, dtype=None)
        v = bk.init(jax.random.key(0), x)
        def fn(img):
            out = bk.apply(v, img)
            if out.ndim == 4:
                out = out.mean(axis=(1, 2))
            elif out.ndim == 3:
                out = out[:, 0]
            return out
        by = export_onnx(fn, (x,), input_names=("image",))
        got = run_model(by, {"image": np.asarray(x)})
        out = list(got.values())[0] if isinstance(got, dict) else got[0]
        ref = np.asarray(fn(x))
        d = float(np.abs(np.asarray(out) - ref).max())
        rel = d / (float(np.abs(ref).max()) + 1e-9)
        print(f"{name:28s} OK   maxdiff={d:.2e} relmax={rel:.2e} "
              f"({time.time()-t0:.0f}s)", flush=True)
    except NotImplementedError as e:
        print(f"{name:28s} MISSING: {str(e)[:90]}", flush=True)
    except Exception as e:
        print(f"{name:28s} FAIL {type(e).__name__}: {str(e)[:90]}", flush=True)
