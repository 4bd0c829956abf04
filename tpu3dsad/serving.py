"""Ahead-of-time export of the whole-scene inference program — the
production-serving path.

The deployable unit is ONE XLA program: forward + box decode + 3D NMS
(SURVEY.md §3.2-3.3, BASELINE.json:11 "full pipeline incl. 3D NMS").
`jax.export` freezes that program (weights inlined as constants) into a
self-contained StableHLO artifact:

  * no Python model code, checkpoint, or config needed at serving time —
    `load(path).call(points, mask)` is the entire server;
  * no first-request jit trace: the artifact is already lowered, only the
    target's XLA backend compile remains (cached by XLA's own cache);
  * the artifact pins the calling convention (shapes/dtypes), so serving
    inputs are validated structurally.

CLI:
  python -m tpu3dsad.serving ckpt=<dir> out=<model.bin> [overrides...]
  python -m tpu3dsad.serving run=<model.bin> scene=<pts.npy> [out=<json>]

The export is platform-specific (the default is the machine's backend;
pass platform=tpu/cpu to cross-export). Outputs are the parsed prediction
dict of eval/parse.py — center, size, heading, sem_cls, obj_prob and the
post-NMS keep mask — all fixed shapes.
"""

from __future__ import annotations

import json

import numpy as np

_EXPORT_KEYS = ("center", "size", "heading", "sem_cls", "obj_prob", "keep")


def build_inference_fn(cfg, variables, mean_sizes,
                       with_features: bool = False):
    """Jitted whole-scene fn(points [B,N,3], mask [B,N][, features [B,N,C]])
    -> parsed dict. with_features matches checkpoints trained with
    data.use_color (the calling convention is part of the artifact)."""
    import jax

    from tpu3dsad.eval.parse import parse_predictions
    from tpu3dsad.models.detector import SizeAdaptiveDetector

    model = SizeAdaptiveDetector(
        cfg.model,
        mean_sizes=tuple(map(tuple, np.asarray(mean_sizes).tolist())),
    )

    def _parse(ep):
        parsed = parse_predictions(
            ep, model._mean_sizes(), cfg.model.num_heading_bins, cfg.eval
        )
        return {k: parsed[k] for k in _EXPORT_KEYS if k in parsed}

    if with_features:
        def infer(points, mask, features):
            return _parse(
                model.apply(variables, points, features, mask=mask,
                            train=False)
            )
    else:
        def infer(points, mask):
            return _parse(model.apply(variables, points, mask=mask,
                                      train=False))

    return jax.jit(infer)


def export_detector(cfg, variables, mean_sizes, batch_size: int,
                    path: str, platform: str | None = None,
                    with_features: bool = False,
                    source_dataset: str = "") -> dict:
    """Serialize the inference program for (batch_size, cfg.data.num_points)
    to `path`. Returns a manifest (also written next to the artifact)."""
    import jax
    import jax.numpy as jnp

    fn = build_inference_fn(cfg, variables, mean_sizes,
                            with_features=with_features)
    n = cfg.data.num_points
    specs = (
        jax.ShapeDtypeStruct((batch_size, n, 3), jnp.float32),
        jax.ShapeDtypeStruct((batch_size, n), jnp.bool_),
    )
    if with_features:
        specs += (jax.ShapeDtypeStruct((batch_size, n, 3), jnp.float32),)
    kwargs = {"platforms": (platform,)} if platform else {}
    exp = jax.export.export(fn, **kwargs)(*specs)
    data = exp.serialize()
    with open(path, "wb") as f:
        f.write(data)
    manifest = {
        "batch_size": batch_size,
        "num_points": n,
        "num_classes": cfg.model.num_classes,
        "platforms": list(exp.platforms),
        "bytes": len(data),
        "outputs": list(_EXPORT_KEYS),
        "with_features": with_features,
        # lets the run CLI apply the SAME feature normalization the
        # training loader used (scannet stores 0-255 rgb, trained on /256)
        "source_dataset": source_dataset,
    }
    with open(path + ".json", "w") as f:
        json.dump(manifest, f)
    return manifest


def load(path: str):
    """Deserialize an exported artifact; returns the jax.export.Exported
    (use `.call(points, mask)`)."""
    import jax

    with open(path, "rb") as f:
        return jax.export.deserialize(f.read())


def prepare_scene_batch(raw: np.ndarray, manifest: dict) -> list:
    """Fit one raw scene [P, 3(+color)] to the artifact's fixed calling
    convention. Oversized clouds subsample without replacement; short clouds
    pad with zeros + mask=False (repo invariant: padding must never join a
    ball or pollute a pool — duplicate-sampled "real" points would)."""
    import jax.numpy as jnp

    B, N = manifest["batch_size"], manifest["num_points"]
    pts = raw[:, :3].astype(np.float32)
    sel = (
        np.random.default_rng(0).choice(len(pts), N, replace=False)
        if len(pts) > N
        else np.arange(len(pts))
    )
    batch_pts = np.zeros((B, N, 3), np.float32)
    batch_pts[0, : len(sel)] = pts[sel]
    mask = np.zeros((B, N), bool)
    mask[0, : len(sel)] = True
    args = [jnp.asarray(batch_pts), jnp.asarray(mask)]
    if manifest.get("with_features"):
        fb = np.zeros((B, N, 3), np.float32)
        if raw.shape[1] >= 6:  # color columns ride along when present
            fb[0, : len(sel)] = raw[sel, 3:6].astype(np.float32)
            if manifest.get("source_dataset") == "scannet":
                # the scannet loader trains on rgb/256 (0-255 on disk);
                # raw values here would be 256x out of distribution
                fb[0] /= 256.0
        args.append(jnp.asarray(fb))
    return args


def main(argv):
    from tpu3dsad.config import parse_cli

    kv, rest = {}, []
    for a in argv:
        key = a.split("=", 1)[0]
        if key in ("ckpt", "out", "run", "scene", "platform"):
            kv[key] = a.split("=", 1)[1]
        else:
            rest.append(a)

    if "run" in kv:  # serve one scene from an exported artifact
        exp = load(kv["run"])
        manifest = json.load(open(kv["run"] + ".json"))
        args = prepare_scene_batch(np.load(kv["scene"]), manifest)
        res = exp.call(*args)
        out = {k: np.asarray(v) for k, v in res.items()}
        keep = out["keep"][0].astype(bool)
        dets = [
            {
                "center": out["center"][0][i].tolist(),
                "size": out["size"][0][i].tolist(),
                "heading": float(out["heading"][0][i]),
                "score": float(out["obj_prob"][0][i]),
                "class": int(out["sem_cls"][0][i]),
            }
            for i in np.nonzero(keep)[0]
        ]
        payload = json.dumps({"detections": dets})
        if "out" in kv:
            with open(kv["out"], "w") as f:
                f.write(payload)
        print(payload)
        return

    if "ckpt" not in kv or "out" not in kv:
        raise SystemExit(main.__doc__ or "see module docstring")
    import jax

    from tpu3dsad import train_lib
    from tpu3dsad.data import get_dataset
    from tpu3dsad.models.detector import SizeAdaptiveDetector  # noqa: F401
    from tpu3dsad.train_detector import build_detector

    cfg = parse_cli(rest)
    dataset = get_dataset(cfg)
    model = build_detector(cfg, dataset.mean_sizes)
    import jax.numpy as jnp

    pts = jnp.zeros((1, cfg.data.num_points, 3), jnp.float32)
    feats = (
        jnp.zeros((1, cfg.data.num_points, 3), jnp.float32)
        if cfg.data.use_color
        else None
    )
    variables = jax.jit(lambda k: model.init(k, pts, feats, train=False))(
        jax.random.key(0)
    )
    tx = train_lib.make_optimizer(cfg.train, 100)
    state = train_lib.TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables["batch_stats"], tx=tx,
    )
    state, step = train_lib.restore_checkpoint(
        kv["ckpt"], state, for_eval=True, use_best=cfg.eval.use_best,
    )
    if step == 0:
        raise SystemExit(
            f"no checkpoint found under {kv['ckpt']!r} — refusing to export "
            "randomly-initialized weights into a serving artifact"
        )
    manifest = export_detector(
        cfg,
        {"params": state.params, "batch_stats": state.batch_stats},
        dataset.mean_sizes,
        cfg.train.batch_size,
        kv["out"],
        platform=kv.get("platform"),
        with_features=cfg.data.use_color,
        source_dataset=cfg.data.name,
    )
    print(json.dumps({"ckpt_step": step, **manifest}))


if __name__ == "__main__":
    import sys

    main(sys.argv[1:])
