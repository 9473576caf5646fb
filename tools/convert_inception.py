#!/usr/bin/env python3
"""One-command Inception weight conversion for literature-comparable FID.

TF-free twin of the reference's download-and-convert step
(``/root/reference/source/inception/download.py:35-246``). This environment
has no network egress, so supply the artifact offline:

    # from the tarball (what the reference downloads):
    python tools/convert_inception.py inception-2015-12-05.tgz

    # or from the extracted GraphDef:
    python tools/convert_inception.py classify_image_graph_def.pb

Writes ``inception.npz`` (or --out PATH) in the flat-key scheme the
evaluate CLI loads via ``--inception_weights``, then sanity-checks the
conversion by running a converted-weight forward on a deterministic input and
printing feature/softmax statistics. A healthy converted model shows a
feature vector with O(0.1-1) entries and a softmax that is *not* uniform
(max prob well above 1/1008); random init fails both visibly.
"""

import argparse
import os
import sys
import tarfile
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

PB_NAME = "classify_image_graph_def.pb"


def extract_pb(path: str, workdir: str) -> str:
    """Return a path to the GraphDef: pass .pb through, extract .tgz."""
    if path.endswith((".tgz", ".tar.gz", ".tar")):
        with tarfile.open(path) as tar:
            member = next(
                (m for m in tar.getmembers() if m.name.endswith(PB_NAME)), None
            )
            if member is None:
                raise FileNotFoundError(f"{PB_NAME} not found inside {path}")
            tar.extract(member, workdir, filter="data")
            return os.path.join(workdir, member.name)
    return path


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("artifact", help=f"inception-2015-12-05.tgz or {PB_NAME}")
    ap.add_argument("--out", default="inception.npz", help="output npz path")
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from rgbd_gan_tpu.eval import inception

    with tempfile.TemporaryDirectory() as workdir:
        pb = extract_pb(args.artifact, workdir)
        print(f"converting {pb} -> {args.out}")
        flat = inception.convert_tf_checkpoint(pb, args.out)
    print(f"wrote {len(flat)} tensors ({sum(v.size for v in flat.values()):,} params)")

    # converted-weight smoke forward: deterministic pseudo-image
    model, variables = inception.load_params(args.out)
    rng = np.random.RandomState(0)
    x = rng.uniform(0, 255, size=(2, inception.INPUT_SIZE, inception.INPUT_SIZE, 3))
    feat = np.asarray(model.apply(variables, jnp.asarray(x, jnp.float32), get_feature=True))
    probs = np.asarray(model.apply(variables, jnp.asarray(x, jnp.float32)))
    print(
        f"feature: shape {feat.shape}, mean|f| {np.abs(feat).mean():.4f}, "
        f"max|f| {np.abs(feat).max():.4f}"
    )
    print(
        f"softmax: max prob {probs.max():.4f} (uniform would be "
        f"{1.0 / inception.NUM_LOGITS:.5f}), top-3 classes {np.argsort(probs[0])[-3:][::-1]}"
    )
    if not np.all(np.isfinite(feat)):
        raise SystemExit("non-finite features — conversion is broken")
    print(
        "OK — use it via:  python -m rgbd_gan_tpu.cli.evaluate --fid "
        f"--inception_weights {args.out} ..."
    )


if __name__ == "__main__":
    main()
