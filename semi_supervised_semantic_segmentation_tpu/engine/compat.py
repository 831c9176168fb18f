"""Reference (torch) checkpoint interop (rebuilds C19's format contract +
N7: "same checkpoint format" via an import/export path, SURVEY §3.4).

Three layers:
  1. Tensor-level: OIHW<->HWIO conv transpose + BatchNorm param/stat split
     (torch weight/bias/running_mean/running_var <-> flax scale/bias +
     batch_stats mean/var).
  2. torchvision ResNet state-dicts -> our flax ResNet encoder params
     (ImageNet-pretrained init, C7), including dilated variants (weights are
     stride/dilation-agnostic).
  3. Reference-layout checkpoint files: ``torch.save({'model', 'ema_model' |
     'model2', 'optimizer_step', 'epoch', 'best_miou'})`` import/export so a
     reference user can bring checkpoints over and take ours back.

torch is only imported inside functions (CPU wheel, host-side only).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# Tensor-level converters
# ---------------------------------------------------------------------------


def conv_torch_to_flax(w: np.ndarray) -> np.ndarray:
    """(O, I, H, W) -> (H, W, I, O)."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def conv_flax_to_torch(w: np.ndarray) -> np.ndarray:
    """(H, W, I, O) -> (O, I, H, W)."""
    return np.ascontiguousarray(np.transpose(w, (3, 2, 0, 1)))


# ---------------------------------------------------------------------------
# Pytree <-> flat dotted dicts (our canonical torch-layout export)
# ---------------------------------------------------------------------------


def flatten_params_to_torch_layout(
    params: Any, batch_stats: Any
) -> Dict[str, np.ndarray]:
    """Flatten a flax variable tree into a flat torch-convention dict:
    convs exported OIHW under '<path>.weight'; BatchNorm exported as
    weight/bias/running_mean/running_var; Dense as weight (out,in)/bias."""
    out: Dict[str, np.ndarray] = {}

    def emit(path, leaf_name, arr):
        out[".".join(path + [leaf_name])] = np.asarray(arr)

    def walk2(prefix, node, stats_node):
        for k, v in node.items():
            stats_v = stats_node.get(k, {}) if isinstance(stats_node, dict) else {}
            if isinstance(v, dict):
                if set(v) >= {"scale", "bias"} and not isinstance(v["scale"], dict):
                    # BatchNorm/GroupNorm params
                    base = prefix + [k]
                    emit(base, "weight", v["scale"])
                    emit(base, "bias", v["bias"])
                    if isinstance(stats_v, dict) and "mean" in stats_v:
                        emit(base, "running_mean", stats_v["mean"])
                        emit(base, "running_var", stats_v["var"])
                elif set(v) >= {"kernel"} and not isinstance(v["kernel"], dict):
                    base = prefix + [k]
                    kern = np.asarray(v["kernel"])
                    if kern.ndim == 4:
                        emit(base, "weight", conv_flax_to_torch(kern))
                    elif kern.ndim == 2:
                        emit(base, "weight", np.ascontiguousarray(kern.T))
                    else:
                        emit(base, "weight", kern)
                    if "bias" in v:
                        emit(base, "bias", v["bias"])
                else:
                    walk2(prefix + [k], v, stats_v)
            else:
                emit(prefix, k, v)

    walk2([], params, batch_stats if isinstance(batch_stats, dict) else {})
    return out


def unflatten_torch_layout(
    flat: Dict[str, np.ndarray], params_template: Any, stats_template: Any
) -> Tuple[Any, Any]:
    """Inverse of flatten_params_to_torch_layout, shaped by templates."""
    import jax

    params = jax.tree.map(lambda x: None, params_template)
    stats = jax.tree.map(lambda x: None, stats_template)

    def set_in(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node[p]
        node[path[-1]] = value

    def to_mutable(t):
        if isinstance(t, dict):
            return {k: to_mutable(v) for k, v in t.items()}
        return t

    params = to_mutable(params)
    stats = to_mutable(stats)

    def fill(template, tree, stats_tree, prefix):
        for k, v in template.items():
            if isinstance(v, dict):
                if set(v) >= {"scale", "bias"} and not isinstance(v["scale"], dict):
                    base = ".".join(prefix + [k])
                    set_in(tree, [*prefix, k, "scale"], flat[base + ".weight"])
                    set_in(tree, [*prefix, k, "bias"], flat[base + ".bias"])
                    if base + ".running_mean" in flat:
                        set_in(stats_tree, [*prefix, k, "mean"], flat[base + ".running_mean"])
                        set_in(stats_tree, [*prefix, k, "var"], flat[base + ".running_var"])
                elif set(v) >= {"kernel"} and not isinstance(v["kernel"], dict):
                    base = ".".join(prefix + [k])
                    w = np.asarray(flat[base + ".weight"])
                    tmpl = np.asarray(v["kernel"]) if not isinstance(v["kernel"], dict) else None
                    if w.ndim == 4:
                        w = conv_torch_to_flax(w)
                    elif w.ndim == 2:
                        w = np.ascontiguousarray(w.T)
                    set_in(tree, [*prefix, k, "kernel"], w.astype(np.asarray(tmpl).dtype))
                    if "bias" in v:
                        set_in(tree, [*prefix, k, "bias"], flat[base + ".bias"])
                else:
                    fill(v, tree, stats_tree, prefix + [k])
            else:
                set_in(tree, [*prefix, k], flat[".".join(prefix + [k])])

    # Template walk needs raw arrays; use the original templates.
    fill(params_template, params, stats, [])

    def fill_missing_stats(tmpl, node):
        if isinstance(tmpl, dict):
            for k, v in tmpl.items():
                if isinstance(v, dict):
                    fill_missing_stats(v, node[k])
                elif node[k] is None:
                    node[k] = np.asarray(v)

    fill_missing_stats(stats_template, stats)
    return params, stats


# ---------------------------------------------------------------------------
# torchvision ResNet -> our encoder
# ---------------------------------------------------------------------------

_TV_BLOCK = re.compile(r"^layer(\d+)\.(\d+)\.(.+)$")


def torchvision_resnet_to_flax(
    sd: Dict[str, Any], params_template: Any, stats_template: Any
) -> Tuple[Any, Any]:
    """Map a torchvision ResNet state-dict onto our encoder param tree.

    Name map (torchvision -> ours):
      conv1/bn1                    -> stem.Conv_0 / stem.Norm_0.BatchNorm_0
      layerL.B.convK/bnK           -> layerL_B.convK.{Conv_0, Norm_0...}
      layerL.B.downsample.0/1      -> layerL_B.downsample.{Conv_0, Norm_0...}
      fc.*                         -> dropped (no classification head here)
    """
    flat: Dict[str, np.ndarray] = {}

    def put_conv(our_base: str, w):
        flat[f"{our_base}.Conv_0.weight"] = np.asarray(w)

    def put_bn(our_base: str, tv_base: str):
        bn = f"{our_base}.Norm_0.BatchNorm_0"
        flat[f"{bn}.weight"] = np.asarray(sd[f"{tv_base}.weight"])
        flat[f"{bn}.bias"] = np.asarray(sd[f"{tv_base}.bias"])
        flat[f"{bn}.running_mean"] = np.asarray(sd[f"{tv_base}.running_mean"])
        flat[f"{bn}.running_var"] = np.asarray(sd[f"{tv_base}.running_var"])

    put_conv("stem", sd["conv1.weight"])
    put_bn("stem", "bn1")
    for key in sd:
        m = _TV_BLOCK.match(key)
        if not m:
            continue
        stage, block, rest = int(m.group(1)), int(m.group(2)), m.group(3)
        ours = f"layer{stage}_{block}"
        if rest.startswith("conv") and rest.endswith(".weight"):
            k = rest[4]
            put_conv(f"{ours}.conv{k}", sd[key])
        elif rest.startswith("bn") and rest.endswith(".weight"):
            k = rest[2]
            put_bn(f"{ours}.conv{k}", f"layer{stage}.{block}.bn{k}")
        elif rest == "downsample.0.weight":
            put_conv(f"{ours}.downsample", sd[key])
        elif rest == "downsample.1.weight":
            put_bn(f"{ours}.downsample", f"layer{stage}.{block}.downsample.1")
    return unflatten_torch_layout(flat, params_template, stats_template)


# ---------------------------------------------------------------------------
# Official HRNet (HRNet-Image-Classification / HRNet-Semantic-Segmentation
# backbone naming) -> our encoder
# ---------------------------------------------------------------------------

_HR_LAYER1 = re.compile(r"^layer1\.(\d+)\.(.+)$")
_HR_TRANS = re.compile(r"^transition(\d)\.(\d+)\.(.+)$")
_HR_STAGE = re.compile(r"^stage(\d)\.(\d+)\.(.+)$")


def hrnet_to_flax(
    sd: Dict[str, Any], params_template: Any, stats_template: Any
) -> Tuple[Any, Any]:
    """Map an official HRNet state-dict onto our flax HRNet encoder.

    Name map (official -> ours, models/hrnet.py):
      conv1/bn1, conv2/bn2           -> stem1, stem2
      layer1.B.convK/bnK(/downsample)-> layer1_B.convK / .downsample
      transitionT.I.[0.]{0,1}        -> transitionT_I   (new-branch entries
                                        nest one extra Sequential)
      stageS.M.branches.I.B.*        -> stageS_mM.branchI_blockB.*
      stageS.M.fuse_layers.I.J.{0,1} -> stageS_mM.fuse_up_J_to_I   (J > I)
      stageS.M.fuse_layers.I.J.K.*   -> stageS_mM.fuse_down_J_to_I_K (J < I)
    Classification heads (incre_modules/downsamp_modules/classifier/
    last_layer) are dropped.  Weights are resolution-agnostic, so the same
    map serves any input size.
    """
    flat: Dict[str, np.ndarray] = {}

    def put_conv(base: str, w):
        flat[f"{base}.Conv_0.weight"] = np.asarray(w)

    def put_bn(base: str, tv: str):
        bn = f"{base}.Norm_0.BatchNorm_0"
        flat[f"{bn}.weight"] = np.asarray(sd[f"{tv}.weight"])
        flat[f"{bn}.bias"] = np.asarray(sd[f"{tv}.bias"])
        flat[f"{bn}.running_mean"] = np.asarray(sd[f"{tv}.running_mean"])
        flat[f"{bn}.running_var"] = np.asarray(sd[f"{tv}.running_var"])

    put_conv("stem1", sd["conv1.weight"])
    put_bn("stem1", "bn1")
    put_conv("stem2", sd["conv2.weight"])
    put_bn("stem2", "bn2")

    for key in sd:
        if not key.endswith(".weight"):
            continue  # bn bias/stats are pulled alongside their .weight
        m = _HR_LAYER1.match(key)
        if m:
            b, rest = int(m.group(1)), m.group(2)
            ours = f"layer1_{b}"
            if rest.startswith("conv"):
                put_conv(f"{ours}.conv{rest[4]}", sd[key])
            elif rest.startswith("bn"):
                put_bn(f"{ours}.conv{rest[2]}", f"layer1.{b}.bn{rest[2]}")
            elif rest == "downsample.0.weight":
                put_conv(f"{ours}.downsample", sd[key])
            elif rest == "downsample.1.weight":
                put_bn(f"{ours}.downsample", f"layer1.{b}.downsample.1")
            continue
        m = _HR_TRANS.match(key)
        if m:
            t, idx, rest = int(m.group(1)), int(m.group(2)), m.group(3)
            base = f"transition{t}_{idx}"
            tvbase = f"transition{t}.{idx}"
            if rest.startswith("0.") and rest.count(".") == 2:
                rest = rest[2:]  # unwrap the new-branch Sequential nesting
                tvbase += ".0"
            if rest == "0.weight":
                put_conv(base, sd[key])
            elif rest == "1.weight":
                put_bn(base, f"{tvbase}.1")
            continue
        m = _HR_STAGE.match(key)
        if m:
            s, mod, rest = int(m.group(1)), int(m.group(2)), m.group(3)
            ours = f"stage{s}_m{mod}"
            bm = re.match(r"^branches\.(\d+)\.(\d+)\.(.+)$", rest)
            if bm:
                i, b, r2 = int(bm.group(1)), int(bm.group(2)), bm.group(3)
                blk = f"{ours}.branch{i}_block{b}"
                tvb = f"stage{s}.{mod}.branches.{i}.{b}"
                if r2.startswith("conv"):
                    put_conv(f"{blk}.conv{r2[4]}", sd[key])
                elif r2.startswith("bn"):
                    put_bn(f"{blk}.conv{r2[2]}", f"{tvb}.bn{r2[2]}")
                elif r2 == "downsample.0.weight":
                    put_conv(f"{blk}.downsample", sd[key])
                elif r2 == "downsample.1.weight":
                    put_bn(f"{blk}.downsample", f"{tvb}.downsample.1")
                continue
            fm = re.match(r"^fuse_layers\.(\d+)\.(\d+)\.(.+)$", rest)
            if fm:
                i, j, r2 = int(fm.group(1)), int(fm.group(2)), fm.group(3)
                tvf = f"stage{s}.{mod}.fuse_layers.{i}.{j}"
                if j > i:
                    if r2 == "0.weight":
                        put_conv(f"{ours}.fuse_up_{j}_to_{i}", sd[key])
                    elif r2 == "1.weight":
                        put_bn(f"{ours}.fuse_up_{j}_to_{i}", f"{tvf}.1")
                else:
                    km = re.match(r"^(\d+)\.([01])\.weight$", r2)
                    if km:
                        k, which = int(km.group(1)), int(km.group(2))
                        base = f"{ours}.fuse_down_{j}_to_{i}_{k}"
                        if which == 0:
                            put_conv(base, sd[key])
                        else:
                            put_bn(base, f"{tvf}.{k}.1")
    return unflatten_torch_layout(flat, params_template, stats_template)


def load_pretrained_encoder(path: str, params: Any, batch_stats: Any):
    """Load a torch encoder state-dict file into the 'encoder' subtree of a
    SegModel param tree.  Accepts .pt/.pth (torch.load) or .npz.  Routing by
    key sniffing: torchvision ResNet layouts and official HRNet layouts are
    supported; anything else raises with the detected shape."""
    if path.endswith(".npz"):
        sd = dict(np.load(path))
    else:
        import torch

        obj = torch.load(path, map_location="cpu", weights_only=True)
        sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
        sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    if "transition1.0.0.weight" in sd:  # HRNet family
        enc_params, enc_stats = hrnet_to_flax(
            sd, params["encoder"], batch_stats.get("encoder", {})
        )
    elif "conv1.weight" in sd and "layer1.0.conv1.weight" in sd:
        enc_params, enc_stats = torchvision_resnet_to_flax(
            sd, params["encoder"], batch_stats.get("encoder", {})
        )
    else:
        raise ValueError(
            "model.pretrained: unrecognized state-dict layout (expected a "
            "torchvision ResNet or an official HRNet); got keys like "
            f"{sorted(sd)[:5]}"
        )
    new_params = dict(params)
    new_params["encoder"] = enc_params
    new_stats = dict(batch_stats)
    new_stats["encoder"] = enc_stats
    return new_params, new_stats


# ---------------------------------------------------------------------------
# Optimizer state (torch SGD momentum_buffer <-> optax trace)
# ---------------------------------------------------------------------------
#
# The reference saves ``state_dict(opt)`` (SURVEY §3.4): {'state': {idx:
# {'momentum_buffer': tensor}}, 'param_groups': [{'params': [idx...], 'lr',
# 'momentum', ...}]}.  Our optax ``trace`` buffer IS torch's momentum_buffer
# (both hold buf after ``buf = momentum*buf + grad``), so interop is a name/
# index/layout mapping, not a math conversion.  Index convention: parameters
# enumerate in our flat torch-layout order (encoder.* then decoder.*; for
# CPS, all of model then all of model2), param_groups split backbone/head
# (the 10x-head-LR construction) per net.


def _is_head_key(flat_key: str) -> bool:
    """Mirror engine.state.head_label_tree: a param is 'head' iff its path
    passes through a module whose name starts with 'decoder'."""
    return any(part.startswith("decoder") for part in flat_key.split("."))


def _pick_momentum(params: Any, labels: Any, traces: Dict[str, Any]) -> Any:
    """Merge the per-group (masked) trace trees into one tree mirroring
    ``params``: at each leaf take the group the label selects (the other
    group's leaf is an optax.MaskedNode sentinel)."""
    if isinstance(params, dict):
        return {
            k: _pick_momentum(
                params[k],
                labels[k],
                {g: t[k] for g, t in traces.items()},
            )
            for k in params
        }
    return traces[labels]


def _split_momentum(merged: Any, labels: Any, template: Any, group: str) -> Any:
    """Inverse of _pick_momentum for one group: take merged leaves where the
    label matches ``group``, keep the template's MaskedNode elsewhere."""
    if isinstance(merged, dict):
        return {
            k: _split_momentum(merged[k], labels[k], template[k], group)
            for k in merged
        }
    return merged if labels == group else template


def export_optimizer_state(state, cfg=None) -> Dict[str, Any]:
    """Build the reference's ``state_dict(opt)`` dict from an optax
    opt_state (momentum buffers in torch OIHW layout, indexed in our flat
    torch-layout parameter order)."""
    import jax
    import torch

    from semi_supervised_semantic_segmentation_tpu.engine.state import (
        get_momentum_trees,
        head_label_tree,
    )

    traces = jax.device_get(get_momentum_trees(state.opt_state))
    params = jax.device_get(state.params)
    is_cps = isinstance(params, dict) and "net1" in params
    nets = [("net1", params["net1"]), ("net2", params["net2"])] if is_cps else [
        (None, params)
    ]

    opt_state_out: Dict[int, Dict[str, Any]] = {}
    param_groups = []
    idx = 0
    lr = float(cfg.optim.lr) if cfg is not None else 0.0
    for net_name, net_params in nets:
        net_traces = (
            {g: t[net_name] for g, t in traces.items()} if net_name else traces
        )
        labels = head_label_tree(net_params)
        merged = _pick_momentum(net_params, labels, net_traces)
        flat_mom = flatten_params_to_torch_layout(merged, {})
        group_idx = {"backbone": [], "head": []}
        for key, buf in flat_mom.items():
            opt_state_out[idx] = {
                "momentum_buffer": torch.from_numpy(np.ascontiguousarray(buf))
            }
            group_idx["head" if _is_head_key(key) else "backbone"].append(idx)
            idx += 1
        for g, mult in (("backbone", 1.0), ("head", None)):
            m = (cfg.optim.head_lr_mult if cfg is not None else 10.0) if mult is None else mult
            param_groups.append(
                {
                    "params": group_idx[g],
                    "lr": lr * m,
                    "momentum": float(cfg.optim.momentum) if cfg is not None else 0.9,
                    "weight_decay": float(cfg.optim.weight_decay) if cfg is not None else 0.0,
                    "nesterov": bool(cfg.optim.nesterov) if cfg is not None else False,
                    "dampening": 0.0,
                }
            )
    return {"state": opt_state_out, "param_groups": param_groups}


def import_optimizer_state(opt_dict: Dict[str, Any], state):
    """Inverse of export_optimizer_state: place torch momentum buffers into
    the optax trace leaves (and sync the LR-schedule step counter to
    ``state.step`` so a resumed trajectory continues at the right LR).
    Returns the new opt_state."""
    import jax

    from semi_supervised_semantic_segmentation_tpu.engine.state import (
        get_momentum_trees,
        head_label_tree,
        replace_momentum_trees,
        set_opt_step,
    )

    raw_state = opt_dict["state"]
    buffers = {
        int(k): np.asarray(
            v["momentum_buffer"].numpy()
            if hasattr(v["momentum_buffer"], "numpy")
            else v["momentum_buffer"]
        )
        for k, v in raw_state.items()
    }
    params = jax.device_get(state.params)
    is_cps = isinstance(params, dict) and "net1" in params
    nets = [("net1", params["net1"]), ("net2", params["net2"])] if is_cps else [
        (None, params)
    ]
    traces = get_momentum_trees(state.opt_state)

    idx = 0
    new_traces = {g: t for g, t in traces.items()}
    for net_name, net_params in nets:
        flat_names = list(flatten_params_to_torch_layout(net_params, {}).keys())
        flat_mom: Dict[str, np.ndarray] = {}
        for key in flat_names:
            if idx not in buffers:
                raise ValueError(
                    f"optimizer state missing index {idx} (param {key!r}); "
                    f"got {len(buffers)} buffers for {len(flat_names)} params"
                )
            flat_mom[key] = buffers[idx]
            idx += 1
        merged, _ = unflatten_torch_layout(flat_mom, net_params, {})
        labels = head_label_tree(net_params)
        for g in new_traces:
            tmpl = new_traces[g][net_name] if net_name else new_traces[g]
            split = _split_momentum(merged, labels, tmpl, g)
            if net_name:
                new_traces[g] = {**new_traces[g], net_name: split}
            else:
                new_traces[g] = split
    if idx != len(buffers):
        raise ValueError(
            f"optimizer state has {len(buffers)} buffers but model enumerates "
            f"{idx} parameters"
        )
    new_opt = replace_momentum_trees(state.opt_state, new_traces)
    return set_opt_step(new_opt, state.step)


# ---------------------------------------------------------------------------
# Reference-layout checkpoint files (torch.save dict)
# ---------------------------------------------------------------------------


def export_reference_checkpoint(
    path: str, state, meta: Optional[dict] = None, cfg=None
):
    """Write the reference's checkpoint layout:
    {'model': flat torch-layout dict, 'ema_model'|'model2': ...,
    'optimizer': state_dict(opt) with momentum buffers, 'epoch',
    'best_miou', 'step'} via torch.save."""
    import jax
    import torch

    meta = meta or {}
    params = jax.device_get(state.params)
    stats = jax.device_get(state.batch_stats)
    out: Dict[str, Any] = {
        "epoch": int(meta.get("epoch", 0)),
        "best_miou": float(meta.get("best_miou", 0.0)),
        "step": int(jax.device_get(state.step)),
    }

    def as_torch(flat):
        return {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in flat.items()}

    if isinstance(params, dict) and "net1" in params:  # CPS dual nets
        out["model"] = as_torch(flatten_params_to_torch_layout(params["net1"], stats["net1"]))
        out["model2"] = as_torch(flatten_params_to_torch_layout(params["net2"], stats["net2"]))
    else:
        out["model"] = as_torch(flatten_params_to_torch_layout(params, stats))
        if state.ema_params is not None:
            out["ema_model"] = as_torch(
                flatten_params_to_torch_layout(
                    jax.device_get(state.ema_params),
                    jax.device_get(state.ema_batch_stats),
                )
            )
    try:
        out["optimizer"] = export_optimizer_state(state, cfg)
    except ValueError:
        pass  # non-make_optimizer opt_state (e.g. tests with a bare optax tx)
    torch.save(out, path)


def import_reference_checkpoint(path: str, state):
    """Read a reference-layout torch checkpoint into a TrainState (params,
    batch_stats, ema/net2, and — when the checkpoint carries 'optimizer' —
    the SGD momentum buffers and LR-schedule step, completing the SURVEY
    §3.4 state_dict(opt) contract).  Checkpoints without 'optimizer' still
    load; momentum then restarts."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    to_np = lambda d: {k: v.numpy() for k, v in d.items()}
    params, stats = state.params, state.batch_stats
    step = np.int32(obj.get("step", 0))
    if "model2" in obj and isinstance(params, dict) and "net1" in params:
        p1, s1 = unflatten_torch_layout(to_np(obj["model"]), params["net1"], stats["net1"])
        p2, s2 = unflatten_torch_layout(to_np(obj["model2"]), params["net2"], stats["net2"])
        new_state = state.replace(
            params={"net1": p1, "net2": p2},
            batch_stats={"net1": s1, "net2": s2},
            step=step,
        )
    else:
        p, s = unflatten_torch_layout(to_np(obj["model"]), params, stats)
        kw = dict(params=p, batch_stats=s, step=step)
        if "ema_model" in obj and state.ema_params is not None:
            ep, es = unflatten_torch_layout(
                to_np(obj["ema_model"]), state.ema_params, state.ema_batch_stats
            )
            kw.update(ema_params=ep, ema_batch_stats=es)
        new_state = state.replace(**kw)
    if "optimizer" in obj:
        new_state = new_state.replace(
            opt_state=import_optimizer_state(obj["optimizer"], new_state)
        )
    return new_state
