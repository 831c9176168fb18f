"""Minimal PyTorch implementation of the REFERENCE training recipe.

This is the parity oracle SURVEY.md §6 demands: the quality gate is "mIoU
within 0.5 pts of the PyTorch reference" (BASELINE.json:5), and with no real
datasets or reference source in this environment, the only rigorous
instantiation is a torch trainer that implements the reference recipe —
SGD(momentum, weight-decay) + poly LR with a 10x decoder group, pixel CE with
ignore_index=255, EMA teacher, FixMatch confidence masking with the "all"
denominator, CutMix on the strong view — and a trajectory-level comparison
against our jitted JAX train steps from identical weights and identical
batches (tests/test_reference_trajectory.py).

Everything here is plain idiomatic PyTorch: nn.BatchNorm2d (including its
*unbiased* running-var update, which flax does not replicate — the factor is
(N/(N-1)) with N = pixels-per-channel, i.e. <1e-4 at the test sizes and
<1e-6 at real crop sizes, absorbed by the trajectory tolerances),
F.cross_entropy, F.interpolate(bilinear, align_corners=False),
torch.optim.SGD.  If any default in our JAX methods drifts from this recipe
(momentum order, BN momentum, ramp-up shape, masking denominator, EMA
placement), the trajectory tests fail.

Weights flow from the flax side through
``engine.compat.flatten_params_to_torch_layout``; the module names below are
chosen so the key translation is a pure string substitution
(``.Conv_0.`` -> ``.conv.``, ``.Norm_0.BatchNorm_0.`` -> ``.bn.``).
"""

from __future__ import annotations

import copy
import math
from typing import Dict, Optional

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# Model twin: ResNet-18 encoder + U-Net decoder (config-1 pair)
# ---------------------------------------------------------------------------


class ConvBN(nn.Module):
    """conv -> BN -> (optional) ReLU; twin of models.layers.ConvNormAct."""

    def __init__(self, cin, cout, k, stride=1, dilation=1, act=True):
        super().__init__()
        pad = (k - 1) * dilation // 2
        self.conv = nn.Conv2d(cin, cout, k, stride, pad, dilation, bias=False)
        self.bn = nn.BatchNorm2d(cout)
        self.act = act

    def forward(self, x):
        x = self.bn(self.conv(x))
        return F.relu(x) if self.act else x


class BasicBlock(nn.Module):
    def __init__(self, cin, planes, stride=1):
        super().__init__()
        self.conv1 = ConvBN(cin, planes, 3, stride)
        self.conv2 = ConvBN(planes, planes, 3, act=False)
        self.downsample = (
            ConvBN(cin, planes, 1, stride, act=False)
            if (stride != 1 or cin != planes)
            else None
        )

    def forward(self, x):
        identity = self.downsample(x) if self.downsample is not None else x
        return F.relu(self.conv2(self.conv1(x)) + identity)


class ResNet18Encoder(nn.Module):
    """Multi-tap R18 (output_stride 32), twin of models.resnet.ResNet."""

    def __init__(self):
        super().__init__()
        self.stem = ConvBN(3, 64, 7, stride=2)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        cin = 64
        for stage, planes in enumerate((64, 128, 256, 512)):
            stride = 1 if stage == 0 else 2
            setattr(self, f"layer{stage + 1}_0", BasicBlock(cin, planes, stride))
            setattr(self, f"layer{stage + 1}_1", BasicBlock(planes, planes, 1))
            cin = planes

    def forward(self, x):
        c1 = self.stem(x)
        x = self.maxpool(c1)
        taps = {"c1": c1}
        for stage in range(4):
            x = getattr(self, f"layer{stage + 1}_0")(x)
            x = getattr(self, f"layer{stage + 1}_1")(x)
            taps[f"c{stage + 2}"] = x
        return taps


class DecoderBlock(nn.Module):
    def __init__(self, cin, cskip, cout):
        super().__init__()
        self.conv1 = ConvBN(cin + cskip, cout, 3)
        self.conv2 = ConvBN(cout, cout, 3)

    def forward(self, x, skip):
        x = F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=False)
        if skip is not None:
            x = torch.cat([x, skip], dim=1)
        return self.conv2(self.conv1(x))


class UNetDecoder(nn.Module):
    def __init__(self, num_classes, enc_channels=(64, 64, 128, 256, 512)):
        super().__init__()
        chans = (256, 128, 64, 32)
        skips = enc_channels[-2::-1]  # c4, c3, c2, c1
        cin = enc_channels[-1]
        for i, (cout, cskip) in enumerate(zip(chans, skips)):
            setattr(self, f"up{i}", DecoderBlock(cin, cskip, cout))
            cin = cout
        self.head = nn.Conv2d(cin, num_classes, 1, bias=True)

    def forward(self, taps, out_hw):
        x = taps["c5"]
        for i, name in enumerate(("c4", "c3", "c2", "c1")):
            x = getattr(self, f"up{i}")(x, taps[name])
        logits = self.head(x)
        return F.interpolate(logits, out_hw, mode="bilinear", align_corners=False)


class SegModelTorch(nn.Module):
    """Twin of models.registry.SegModel for (resnet18, unet)."""

    def __init__(self, num_classes):
        super().__init__()
        self.encoder = ResNet18Encoder()
        self.decoder = UNetDecoder(num_classes)

    def forward(self, x):
        return self.decoder(self.encoder(x), x.shape[-2:])


def load_flat_into_torch(model: nn.Module, flat: Dict[str, np.ndarray]) -> None:
    """Load a ``flatten_params_to_torch_layout`` export into the torch twin."""
    sd = {}
    for k, v in flat.items():
        tk = k.replace(".Conv_0.", ".conv.").replace(".Norm_0.BatchNorm_0.", ".bn.")
        sd[tk] = torch.from_numpy(np.ascontiguousarray(v)).float()
    for k, v in model.state_dict().items():
        if k.endswith("num_batches_tracked"):
            sd[k] = v
    model.load_state_dict(sd)


# ---------------------------------------------------------------------------
# Reference recipe: optimizer, schedules, losses, EMA
# ---------------------------------------------------------------------------


def make_sgd(model: nn.Module, lr, momentum, weight_decay, head_lr_mult):
    backbone = [p for n, p in model.named_parameters() if not n.startswith("decoder")]
    head = [p for n, p in model.named_parameters() if n.startswith("decoder")]
    opt = torch.optim.SGD(
        [
            {"params": backbone, "lr": lr, "lr_mult": 1.0},
            {"params": head, "lr": lr * head_lr_mult, "lr_mult": head_lr_mult},
        ],
        lr=lr,
        momentum=momentum,
        weight_decay=weight_decay,
    )
    return opt


def set_poly_lr(opt, base_lr, step, total_steps, power=0.9):
    frac = min(max(step / max(total_steps, 1), 0.0), 1.0)
    lr = base_lr * (1.0 - frac) ** power
    for g in opt.param_groups:
        g["lr"] = lr * g["lr_mult"]


def consistency_weight(step, base_weight, rampup_steps, kind="sigmoid"):
    if rampup_steps <= 0:
        return base_weight
    t = min(max(step / rampup_steps, 0.0), 1.0)
    ramp = math.exp(-5.0 * (1.0 - t) ** 2) if kind == "sigmoid" else t
    return base_weight * ramp


def confidence_masked_ce(logits, pseudo, conf_mask, ignore_index=255):
    """FixMatch 'all' normalization: numerator over confident valid pixels,
    denominator = count of valid (non-ignore) pixels."""
    valid = pseudo != ignore_index
    keep = valid & conf_mask
    safe = torch.where(keep, pseudo, torch.zeros_like(pseudo))
    logp = F.log_softmax(logits.float(), dim=1)
    ll = logp.gather(1, safe.unsqueeze(1).long()).squeeze(1)
    denom = valid.float().sum().clamp(min=1.0)
    return -(ll * keep.float()).sum() / denom


@torch.no_grad()
def ema_update(teacher: nn.Module, student: nn.Module, alpha: float) -> None:
    """theta_t <- alpha * theta_t + (1 - alpha) * theta_s, params AND float
    buffers (BN running stats) — matching engine.state.ema_update which EMAs
    batch_stats too."""
    for pt, ps in zip(teacher.parameters(), student.parameters()):
        pt.mul_(alpha).add_(ps, alpha=1.0 - alpha)
    for bt, bs in zip(teacher.buffers(), student.buffers()):
        if bt.dtype.is_floating_point:
            bt.mul_(alpha).add_(bs, alpha=1.0 - alpha)


# ---------------------------------------------------------------------------
# Reference trainers (trajectory oracles)
# ---------------------------------------------------------------------------


class SupervisedReferenceTrainer:
    """The reference's supervised loop: normalize -> fwd -> CE(ignore 255)
    -> poly SGD.  Consumes pre-augmented [0,1] views (aug parity is pinned
    separately by tests/test_augment.py)."""

    def __init__(self, model, cfg, total_steps):
        self.model = model
        self.cfg = cfg
        self.total_steps = total_steps
        o = cfg.optim
        self.opt = make_sgd(model, o.lr, o.momentum, o.weight_decay, o.head_lr_mult)
        self.step = 0

    def normalize(self, x01):
        mean = torch.tensor(self.cfg.data.mean).view(1, 3, 1, 1)
        std = torch.tensor(self.cfg.data.std).view(1, 3, 1, 1)
        return (x01 - mean) / std

    def train_step(self, x01, y):
        o = self.cfg.optim
        set_poly_lr(self.opt, o.lr, self.step, self.total_steps, o.poly_power)
        self.model.train()
        logits = self.model(self.normalize(x01))
        loss = F.cross_entropy(
            logits, y.long(), ignore_index=self.cfg.data.ignore_index
        )
        self.opt.zero_grad()
        loss.backward()
        self.opt.step()
        self.step += 1
        return {"loss": float(loss.detach())}


class FixMatchReferenceTrainer(SupervisedReferenceTrainer):
    """The reference's FixMatch+CutMix loop: EMA teacher pseudo-labels on the
    weak view (argmax + conf mask, padding -> ignore), CutMix of the strong
    view + pseudo maps, one batched student forward, CE_sup + lam * masked
    CE, SGD, EMA update of params and BN stats."""

    def __init__(self, model, cfg, total_steps):
        super().__init__(model, cfg, total_steps)
        self.teacher = copy.deepcopy(model)
        for p in self.teacher.parameters():
            p.requires_grad_(False)

    def train_step_fixmatch(
        self,
        xl01,
        y,
        xu_weak01,
        xu_strong01,
        uvalid,  # (B,H,W) bool geometric-content mask of the weak view
        box,  # (B,H,W) bool CutMix boxes (True = take roll-by-1 partner)
    ):
        cfg, o, m = self.cfg, self.cfg.optim, self.cfg.method
        ignore = cfg.data.ignore_index
        set_poly_lr(self.opt, o.lr, self.step, self.total_steps, o.poly_power)

        self.teacher.eval()
        with torch.no_grad():
            tlogits = self.teacher(self.normalize(xu_weak01))
            probs = F.softmax(tlogits.float(), dim=1)
            conf, pseudo = probs.max(dim=1)
            conf_mask = conf > m.conf_thresh
            pseudo = torch.where(uvalid, pseudo, torch.full_like(pseudo, ignore))

        # CutMix: the same box cuts image, pseudo-labels, and the conf mask.
        bx = box.unsqueeze(1)
        xu_mix = torch.where(bx, xu_strong01.roll(1, 0), xu_strong01)
        pseudo = torch.where(box, pseudo.roll(1, 0), pseudo)
        conf_mask = torch.where(box, conf_mask.roll(1, 0), conf_mask)

        lam = consistency_weight(
            self.step, m.consistency_weight, m.rampup_iters, m.rampup_kind
        )
        nl = xl01.shape[0]
        self.model.train()
        x = torch.cat([self.normalize(xl01), self.normalize(xu_mix)], dim=0)
        logits = self.model(x)
        sup = F.cross_entropy(logits[:nl], y.long(), ignore_index=ignore)
        unsup = confidence_masked_ce(logits[nl:], pseudo, conf_mask, ignore)
        loss = sup + lam * unsup

        self.opt.zero_grad()
        loss.backward()
        self.opt.step()
        ema_update(self.teacher, self.model, m.ema_alpha)
        self.step += 1
        return {
            "loss": float(loss.detach()),
            "sup_loss": float(sup.detach()),
            "unsup_loss": float(unsup.detach()),
        }


@torch.no_grad()
def eval_miou(model, images01, labels, num_classes, mean, std, ignore=255):
    """Whole-image eval -> (per-class IoU, mIoU), the reference protocol."""
    model.eval()
    meant = torch.tensor(mean).view(1, 3, 1, 1)
    stdt = torch.tensor(std).view(1, 3, 1, 1)
    pred = model((images01 - meant) / stdt).argmax(dim=1)
    gt = labels.long()
    valid = gt != ignore
    idx = num_classes * gt[valid] + pred[valid]
    cm = torch.bincount(idx, minlength=num_classes * num_classes)
    cm = cm.reshape(num_classes, num_classes).double()
    inter = cm.diag()
    union = cm.sum(0) + cm.sum(1) - inter
    iou = inter / union.clamp(min=1.0)
    return iou.numpy(), float(iou[union > 0].mean())


class MeanTeacherReferenceTrainer(SupervisedReferenceTrainer):
    """The reference's Mean-Teacher loop: EMA teacher on the weak view,
    student on the strong view, softmax-MSE consistency (torch F.mse_loss
    'mean' semantics over valid pixels) with ramp-up, SGD, EMA update."""

    def __init__(self, model, cfg, total_steps):
        super().__init__(model, cfg, total_steps)
        self.teacher = copy.deepcopy(model)
        for p in self.teacher.parameters():
            p.requires_grad_(False)

    def train_step_mt(self, xl01, y, xu_weak01, xu_strong01, uvalid):
        cfg, o, m = self.cfg, self.cfg.optim, self.cfg.method
        set_poly_lr(self.opt, o.lr, self.step, self.total_steps, o.poly_power)

        self.teacher.eval()
        with torch.no_grad():
            tlogits = self.teacher(self.normalize(xu_weak01))

        lam = consistency_weight(
            self.step, m.consistency_weight, m.rampup_iters, m.rampup_kind
        )
        nl = xl01.shape[0]
        self.model.train()
        x = torch.cat([self.normalize(xl01), self.normalize(xu_strong01)], dim=0)
        logits = self.model(x)
        sup = F.cross_entropy(
            logits[:nl], y.long(), ignore_index=cfg.data.ignore_index
        )
        ps = F.softmax(logits[nl:].float(), dim=1)
        pt = F.softmax(tlogits.float(), dim=1)
        sq = (ps - pt) ** 2
        mask = uvalid.float().unsqueeze(1)
        denom = (mask.sum() * sq.shape[1]).clamp(min=1.0)
        unsup = (sq * mask).sum() / denom
        loss = sup + lam * unsup

        self.opt.zero_grad()
        loss.backward()
        self.opt.step()
        ema_update(self.teacher, self.model, m.ema_alpha)
        self.step += 1
        return {
            "loss": float(loss.detach()),
            "sup_loss": float(sup.detach()),
            "unsup_loss": float(unsup.detach()),
        }


class CPSReferenceTrainer:
    """The reference's cross-pseudo-supervision loop: two independently
    initialized nets, each CE-supervised on labels and by the other's hard
    argmax pseudo-labels (detached) on labeled AND unlabeled views; one SGD
    config applied to both nets (identical math to the single optimizer
    over the concatenated pytree used on the jax side)."""

    def __init__(self, model1, model2, cfg, total_steps):
        self.m1, self.m2 = model1, model2
        self.cfg = cfg
        self.total_steps = total_steps
        o = cfg.optim
        self.opt1 = make_sgd(model1, o.lr, o.momentum, o.weight_decay, o.head_lr_mult)
        self.opt2 = make_sgd(model2, o.lr, o.momentum, o.weight_decay, o.head_lr_mult)
        self.step = 0

    def normalize(self, x01):
        mean = torch.tensor(self.cfg.data.mean).view(1, 3, 1, 1)
        std = torch.tensor(self.cfg.data.std).view(1, 3, 1, 1)
        return (x01 - mean) / std

    @staticmethod
    def _cps(p1, p2, valid, ignore):
        y1 = p1.argmax(dim=1).detach()
        y2 = p2.argmax(dim=1).detach()
        y1 = torch.where(valid, y1, torch.full_like(y1, ignore))
        y2 = torch.where(valid, y2, torch.full_like(y2, ignore))
        return F.cross_entropy(p1, y2, ignore_index=ignore) + F.cross_entropy(
            p2, y1, ignore_index=ignore
        )

    def train_step_cps(self, xl01, y, xu01, lvalid, uvalid):
        cfg, o, m = self.cfg, self.cfg.optim, self.cfg.method
        ignore = cfg.data.ignore_index
        set_poly_lr(self.opt1, o.lr, self.step, self.total_steps, o.poly_power)
        set_poly_lr(self.opt2, o.lr, self.step, self.total_steps, o.poly_power)

        nl = xl01.shape[0]
        self.m1.train()
        self.m2.train()
        x = torch.cat([self.normalize(xl01), self.normalize(xu01)], dim=0)
        p1 = self.m1(x)
        p2 = self.m2(x)
        sup = F.cross_entropy(p1[:nl], y.long(), ignore_index=ignore) + F.cross_entropy(
            p2[:nl], y.long(), ignore_index=ignore
        )
        cps = self._cps(p1[:nl], p2[:nl], lvalid, ignore) + self._cps(
            p1[nl:], p2[nl:], uvalid, ignore
        )
        loss = sup + m.cps_weight * cps

        self.opt1.zero_grad()
        self.opt2.zero_grad()
        loss.backward()
        self.opt1.step()
        self.opt2.step()
        self.step += 1
        return {
            "loss": float(loss.detach()),
            "sup_loss": float(sup.detach()),
            "cps_loss": float(cps.detach()),
        }
