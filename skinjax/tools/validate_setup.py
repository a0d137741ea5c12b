"""Environment + experiment smoke check — the reference's
``validate_inference_setup.py:18-80`` role: verify imports, accelerator
availability, dataset files, persisted featurizer, and checkpoints before a
long run.

  python -m skinjax.tools.validate_setup [--metadata-csv X --images-dir Y
      --featurizer F --checkpoint C]
"""

from __future__ import annotations

import argparse
import os
import sys


def check(name: str, fn) -> bool:
    try:
        detail = fn()
        print(f"  ✓ {name}" + (f" ({detail})" if detail else ""))
        return True
    except Exception as e:
        print(f"  ✗ {name}: {type(e).__name__}: {e}")
        return False


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--metadata-csv", default=None)
    p.add_argument("--images-dir", default=None)
    p.add_argument("--featurizer", default=None)
    p.add_argument("--checkpoint", default=None)
    args = p.parse_args(argv)

    ok = True
    print("imports:")
    for mod in ("numpy", "pandas", "cv2", "jax", "flax", "optax",
                "orbax.checkpoint", "skinjax"):
        ok &= check(mod, lambda m=mod: __import__(m) and "")

    print("accelerator:")

    def devices():
        import jax

        ds = jax.devices()
        return f"{len(ds)}x {ds[0].platform}"

    ok &= check("jax.devices", devices)

    def native():
        from skinjax.data import native as n

        return "built" if n.load() is not None else "numpy fallback"

    ok &= check("native staging", native)

    if args.metadata_csv:
        print("data:")
        ok &= check("metadata csv", lambda: (
            os.path.exists(args.metadata_csv) or (_ for _ in ()).throw(
                FileNotFoundError(args.metadata_csv)) ) and "")
        if args.images_dir:
            def imgs():
                n = len(os.listdir(args.images_dir))
                if n == 0:
                    raise FileNotFoundError("no images")
                return f"{n} files"

            ok &= check("images dir", imgs)
    if args.featurizer:
        def fz():
            from skinjax.data.featurizer import MetadataFeaturizer

            f = MetadataFeaturizer.load(args.featurizer)
            return f"{f.dim} features, {f.num_classes} classes"

        ok &= check("featurizer", fz)
    if args.checkpoint:
        ok &= check("checkpoint dir", lambda: (
            os.path.isdir(args.checkpoint) or (_ for _ in ()).throw(
                FileNotFoundError(args.checkpoint))) and "")

    print("OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
