"""One-way torch→JAX weight importer (SURVEY.md §5 "Checkpoint / resume":
a lineage checkpoint can seed parity evaluation).

Maps the lineage VoteNet naming convention (models/backbone_module.py,
models/voting_module.py `[LINEAGE]`) onto this framework's Flax tree:

  backbone_net.sa{i}.mlp_module.layer{j}.conv.weight   [out,in,1,1]
      → backbone/sa{i}/mlp_0/dense_{j}/kernel          [in,out]
  backbone_net.sa{i}.mlp_module.layer{j}.bn.bn.{weight,bias,
      running_mean,running_var}
      → backbone/sa{i}/mlp_0/bn_{j}/{scale,bias} + batch_stats {mean,var}
  backbone_net.fp{i}.mlp.layer{j}.*                    → backbone/fp{i}/mlp/*
  vgen.conv{1,2}.weight [out,in,1] + vgen.bn{1,2}.*    → voting/dense_{0,1}/*
  vgen.conv3.weight/bias                               → voting/out/*

The lineage is channels-first; kernels are transposed to channels-last
(SURVEY.md §7 design invariants). The lineage proposal head (pnet.*) imports
into models/proposal.py::LineageProposal (build the detector with
model.proposal_mode='lineage'); end-to-end box-level parity on a fully
ported checkpoint is pinned by tests/modules/test_detector_torch_parity.py.
The 3DSAD size-adaptive head is structurally new (radius bank) and has no
torch counterpart — in 'adaptive' mode its params stay as initialized.
`import_lineage_weights` returns the (copied, skipped) source keys so
callers can verify coverage.
"""

from __future__ import annotations

import numpy as np


def _conv_to_dense(w: np.ndarray) -> np.ndarray:
    """torch conv weight [out, in, 1(,1)] → flax dense kernel [in, out]."""
    w = np.asarray(w)
    while w.ndim > 2:
        if w.shape[-1] != 1:
            raise ValueError(f"not a 1x1 conv: {w.shape}")
        w = w[..., 0]
    return np.ascontiguousarray(w.T)


def _rules(num_sa: int = 4, num_fp: int = 2, mlp_layers: int = 3):
    out = []
    for i in range(1, num_sa + 1):
        for j in range(mlp_layers):
            src = f"backbone_net.sa{i}.mlp_module.layer{j}"
            dst = ("backbone", f"sa{i}", "mlp_0")
            out.append((src, dst, f"dense_{j}", f"bn_{j}"))
    for i in range(1, num_fp + 1):
        for j in range(mlp_layers - 1):
            src = f"backbone_net.fp{i}.mlp.layer{j}"
            dst = ("backbone", f"fp{i}", "mlp")
            out.append((src, dst, f"dense_{j}", f"bn_{j}"))
    return out


def import_lineage_weights(state_dict: dict, variables: dict) -> tuple[dict, list, list]:
    """Copy lineage weights into a detector `variables` pytree.

    state_dict: flat {torch_name: array}; variables: {'params':…,
    'batch_stats':…} as produced by model.init. Returns (new_variables,
    copied_keys, skipped_keys).
    """
    import copy

    variables = copy.deepcopy(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]}
    )
    params, stats = variables["params"], variables["batch_stats"]
    copied = []

    def put(tree, path, value, expect_shape=True):
        node = tree
        for p in path[:-1]:
            node = node[p]
        old = node[path[-1]]
        value = np.asarray(value, np.float32)
        if old.shape != value.shape:
            raise ValueError(f"{'/'.join(path)}: {old.shape} vs {value.shape}")
        node[path[-1]] = value

    def try_copy(src, dst_mod, dense, bn):
        hit = False
        if f"{src}.conv.weight" in state_dict:
            put(
                params,
                dst_mod + (dense, "kernel"),
                _conv_to_dense(state_dict[f"{src}.conv.weight"]),
            )
            copied.append(f"{src}.conv.weight")
            hit = True
        for torch_bn_prefix in (f"{src}.bn.bn", f"{src}.bn"):
            if f"{torch_bn_prefix}.weight" in state_dict:
                put(params, dst_mod + (bn, "scale"), state_dict[f"{torch_bn_prefix}.weight"])
                put(params, dst_mod + (bn, "bias"), state_dict[f"{torch_bn_prefix}.bias"])
                put(stats, dst_mod + (bn, "mean"), state_dict[f"{torch_bn_prefix}.running_mean"])
                put(stats, dst_mod + (bn, "var"), state_dict[f"{torch_bn_prefix}.running_var"])
                copied.extend(
                    f"{torch_bn_prefix}.{s}"
                    for s in ("weight", "bias", "running_mean", "running_var")
                )
                hit = True
                break
        return hit

    for src, dst, dense, bn in _rules():
        try_copy(src, dst, dense, bn)

    # voting module: vgen.conv1/conv2 (+bn1/bn2), conv3 with bias
    for j, (cv, bn) in enumerate((("conv1", "bn1"), ("conv2", "bn2"))):
        if f"vgen.{cv}.weight" in state_dict:
            put(params, ("voting", f"dense_{j}", "kernel"),
                _conv_to_dense(state_dict[f"vgen.{cv}.weight"]))
            copied.append(f"vgen.{cv}.weight")
        if f"vgen.{cv}.bias" in state_dict:  # upstream Conv1d default bias
            put(params, ("voting", f"dense_{j}", "bias"),
                state_dict[f"vgen.{cv}.bias"])
            copied.append(f"vgen.{cv}.bias")
        if f"vgen.{bn}.weight" in state_dict:
            put(params, ("voting", f"bn_{j}", "scale"), state_dict[f"vgen.{bn}.weight"])
            put(params, ("voting", f"bn_{j}", "bias"), state_dict[f"vgen.{bn}.bias"])
            put(stats, ("voting", f"bn_{j}", "mean"), state_dict[f"vgen.{bn}.running_mean"])
            put(stats, ("voting", f"bn_{j}", "var"), state_dict[f"vgen.{bn}.running_var"])
            copied.extend(
                f"vgen.{bn}.{s}"
                for s in ("weight", "bias", "running_mean", "running_var")
            )
    if "vgen.conv3.weight" in state_dict:
        put(params, ("voting", "out", "kernel"),
            _conv_to_dense(state_dict["vgen.conv3.weight"]))
        put(params, ("voting", "out", "bias"), state_dict["vgen.conv3.bias"])
        copied.extend(["vgen.conv3.weight", "vgen.conv3.bias"])

    # lineage proposal head (pnet.*) → LineageProposal (requires the model
    # to be built with model.proposal_mode='lineage'; the size-adaptive head
    # has a different structure and stays as initialized otherwise)
    if "proposal" in params and "sa_mlp" in params["proposal"]:
        for j in range(3):
            src = f"pnet.vote_aggregation.mlp_module.layer{j}"
            if f"{src}.conv.weight" in state_dict:
                put(params, ("proposal", "sa_mlp", f"dense_{j}", "kernel"),
                    _conv_to_dense(state_dict[f"{src}.conv.weight"]))
                copied.append(f"{src}.conv.weight")
            for pre in (f"{src}.bn.bn", f"{src}.bn"):
                if f"{pre}.weight" in state_dict:
                    put(params, ("proposal", "sa_mlp", f"bn_{j}", "scale"),
                        state_dict[f"{pre}.weight"])
                    put(params, ("proposal", "sa_mlp", f"bn_{j}", "bias"),
                        state_dict[f"{pre}.bias"])
                    put(stats, ("proposal", "sa_mlp", f"bn_{j}", "mean"),
                        state_dict[f"{pre}.running_mean"])
                    put(stats, ("proposal", "sa_mlp", f"bn_{j}", "var"),
                        state_dict[f"{pre}.running_var"])
                    copied.extend(f"{pre}.{s}" for s in
                                  ("weight", "bias", "running_mean",
                                   "running_var"))
                    break
        for j, (cv, bn) in enumerate((("conv1", "bn1"), ("conv2", "bn2"))):
            if f"pnet.{cv}.weight" in state_dict:
                put(params, ("proposal", f"head_{j}", "kernel"),
                    _conv_to_dense(state_dict[f"pnet.{cv}.weight"]))
                copied.append(f"pnet.{cv}.weight")
            if f"pnet.{cv}.bias" in state_dict:  # upstream default bias
                put(params, ("proposal", f"head_{j}", "bias"),
                    state_dict[f"pnet.{cv}.bias"])
                copied.append(f"pnet.{cv}.bias")
            if f"pnet.{bn}.weight" in state_dict:
                put(params, ("proposal", f"head_bn_{j}", "scale"),
                    state_dict[f"pnet.{bn}.weight"])
                put(params, ("proposal", f"head_bn_{j}", "bias"),
                    state_dict[f"pnet.{bn}.bias"])
                put(stats, ("proposal", f"head_bn_{j}", "mean"),
                    state_dict[f"pnet.{bn}.running_mean"])
                put(stats, ("proposal", f"head_bn_{j}", "var"),
                    state_dict[f"pnet.{bn}.running_var"])
                copied.extend(f"pnet.{bn}.{s}" for s in
                              ("weight", "bias", "running_mean",
                               "running_var"))
        if "pnet.conv3.weight" in state_dict:
            put(params, ("proposal", "head_out", "kernel"),
                _conv_to_dense(state_dict["pnet.conv3.weight"]))
            put(params, ("proposal", "head_out", "bias"),
                state_dict["pnet.conv3.bias"])
            copied.extend(["pnet.conv3.weight", "pnet.conv3.bias"])

    skipped = [k for k in state_dict if k not in copied]
    return variables, copied, skipped


def load_torch_checkpoint(path: str) -> dict:
    """Load a lineage checkpoint.tar → flat numpy state_dict (CPU torch)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state_dict", ckpt)
    return {k: v.detach().numpy() for k, v in sd.items()}


def main(argv):
    """Convert a lineage `checkpoint.tar` into an orbax checkpoint directory
    this framework's CLIs load directly (the user-facing switchover path):

      python -m tpu3dsad.utils.import_torch ckpt=<checkpoint.tar> \
          out=<ckpt_dir> [section.key=value overrides...]

    The detector is built in proposal_mode='lineage' (the importable
    fixed-radius head) at the override-specified shapes; the import is saved
    as a step-1 orbax state, so `eval.py train.ckpt_dir=<out>` evaluates the
    ported weights and `train.py` auto-resumes = fine-tunes from them.
    Prints a JSON coverage report; exits nonzero if any source tensor could
    not be placed (parity would be silently broken otherwise)."""
    import json
    import sys
    from dataclasses import replace

    import jax
    import jax.numpy as jnp

    from tpu3dsad import train_lib
    from tpu3dsad.config import parse_cli
    from tpu3dsad.models.detector import SizeAdaptiveDetector

    kv, rest = {}, []
    for a in argv:
        key = a.split("=", 1)[0]
        if key in ("ckpt", "out"):
            kv[key] = a.split("=", 1)[1]
        else:
            rest.append(a)
    if "ckpt" not in kv or "out" not in kv:
        raise SystemExit(main.__doc__)
    cfg = parse_cli(rest)
    if cfg.model.proposal_mode != "lineage":
        cfg = replace(cfg, model=replace(cfg.model, proposal_mode="lineage"))

    sd = {
        k: v
        for k, v in load_torch_checkpoint(kv["ckpt"]).items()
        if "num_batches_tracked" not in k  # torch BN bookkeeping, not weights
    }

    model = SizeAdaptiveDetector(cfg.model)
    pts = jnp.zeros((1, cfg.data.num_points, 3), jnp.float32)
    feats = (
        jnp.zeros((1, cfg.data.num_points, 3), jnp.float32)
        if cfg.data.use_color
        else None
    )
    variables = jax.jit(
        lambda k: model.init(k, pts, feats, train=False)
    )(jax.random.key(0))
    variables = {
        "params": jax.tree.map(np.asarray, variables["params"]),
        "batch_stats": jax.tree.map(np.asarray, variables["batch_stats"]),
    }
    new_vars, copied, skipped = import_lineage_weights(sd, variables)

    tx = train_lib.make_optimizer(cfg.train, steps_per_epoch=100)
    state = train_lib.TrainState.create(
        apply_fn=model.apply,
        params=new_vars["params"],
        batch_stats=new_vars["batch_stats"],
        tx=tx,
    )
    train_lib.save_checkpoint(kv["out"], state, step=1)
    print(
        json.dumps(
            {
                "copied": len(copied),
                "total_source_tensors": len(sd),
                "skipped": skipped,
                "out": kv["out"],
            }
        )
    )
    if skipped:
        print(
            "ERROR: unported lineage tensors (shape/layout mismatch with "
            "the configured model) — fix the overrides",
            file=sys.stderr,
        )
        raise SystemExit(1)


if __name__ == "__main__":
    import sys

    main(sys.argv[1:])
