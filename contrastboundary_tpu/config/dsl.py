"""The reference's op-string architecture DSL, kept as the public API.

Users of the reference type strings like
  'pospool|multi-Ua-concat-latent|contrast-Ua-softnn-latent-label-l2-w.1'
to select backbone + heads (tensorflow/config/head.py:56-169 parses the
segments; config/utils.py:312-329 parses stage specs like 'Ua', 'D012_U34').
This module re-implements the same grammar on top of the dataclass config
tree — the names are preserved exactly so reference configs translate 1:1.
"""
from __future__ import annotations

import re
from typing import List, Optional, Tuple

from ..losses.contrast import ContrastConfig


def parse_stage(spec: str, num_layers: int) -> List[Tuple[str, int]]:
    """'Ua' → all up stages; 'U0' → [(up,0)]; 'D012_U34' → down 0,1,2 + up 3,4;
    'a' alone → all up stages (reference config/utils.py:312-329)."""
    spec = spec or "Ua"
    out: List[Tuple[str, int]] = []
    for part in spec.split("_"):
        if not part:
            continue
        m = re.match(r"^([UDud]?)([0-9a]+)$", part)
        if not m:
            raise ValueError(f"invalid stage spec {part!r} in {spec!r}")
        side = {"U": "up", "D": "down", "": "up"}[m.group(1).upper()]
        digits = m.group(2)
        if digits == "a":
            out += [(side, i) for i in range(num_layers)]
        else:
            out += [(side, int(d)) for d in digits]
    return out


_WEIGHT_RE = re.compile(r"^w(\d*\.?\d+)$")
# temperature: 'T1' or the reference's margin/temperature token 'mT.5'/'mT2'
# (tensorflow/config/s3dis.py:151-157 op-strings like '...-l2-mT.5-w.1')
_TEMP_RE = re.compile(r"^m?T(\d*\.?\d+)$")
_LABELKL_RE = re.compile(r"^labelkl(\d*\.?\d+)?$")
# margin token 'm<x>' (not 'mask'/'max'): reference config/head.py:161-162
# strips the leading 'm'; inside the value 'T<f>' sets temperature and 'S'
# the separate-pos term (head.py:740-741, 763, 784); other values ('.1',
# 'I') are stored but inert, exactly like the reference loss
_MARGIN_RE = re.compile(r"^m(?!ask$)(?!ax$)(\S+)$")
_MASK_RE = re.compile(r"^mask(\d*\.?\d+|\.\d+)?$")
_POWER_RE = re.compile(r"^p(\d*\.?\d+)$")


def parse_contrast_ops(ops: str, num_layers: int = 5) -> ContrastConfig:
    """Parse 'contrast-Ua-softnn-latent-label-l2-w.1' (order-insensitive
    tokens, like the reference's segment scan in config/head.py:119-169)."""
    tokens = ops.split("-")
    if tokens and tokens[0] == "contrast":
        tokens = tokens[1:]

    kw = dict(
        contrast="softnn", dist="l2", pos="cnt", temperature=1.0, weight=0.1
    )
    stages: Optional[Tuple[int, ...]] = None
    for t in tokens:
        if not t:
            continue
        if t in ("softnn", "nce"):
            kw["contrast"] = t
        elif t in ("l2", "l2square", "norml2", "kl", "cos"):
            kw["dist"] = "norml2" if t == "cos" else t
        elif t in ("latent", "logits", "probs", "f_out", "fout"):
            kw["ftype"] = "f_out" if t == "fout" else t
        elif t in ("label", "cnt"):
            pass  # sample source; 'label' is the flagship default
        elif t in ("glb", "sub", "subspatial", "pts", "vote"):
            # fail loudly instead of silently falling back to 'label'
            # (round-1 review: never swallow tokens)
            raise NotImplementedError(
                f"contrast sample source {t!r} is not wired — only "
                f"label-neighborhood sampling (+nn<k>/rand<k>) is implemented"
            )
        elif _LABELKL_RE.match(t):
            m = _LABELKL_RE.match(t)
            kw["pos"] = "kl"
            if m.group(1):
                kw["kl_threshold"] = float(m.group(1))
        elif _WEIGHT_RE.match(t):
            kw["weight"] = float(_WEIGHT_RE.match(t).group(1))
        elif t.startswith("w."):
            kw["weight"] = float(t[1:])
        elif _TEMP_RE.match(t):
            kw["temperature"] = float(_TEMP_RE.match(t).group(1))
        elif _MASK_RE.match(t):
            # 'mask' / 'mask.1': nce flat mean over positive terms
            # (head.py:730-732, 796-798; the float suffix is parsed but
            # numerically inert in the reference — same here)
            kw["mask_mode"] = True
        elif _MARGIN_RE.match(t):
            val = _MARGIN_RE.match(t).group(1)
            kw["margin"] = val
            if "T" in val:
                kw["temperature"] = float(val[val.index("T") + 1 :])
            if "S" in val:
                kw["separate_pos"] = True
        elif _POWER_RE.match(t):
            kw["power"] = float(_POWER_RE.match(t).group(1))
        elif t.startswith("proj"):
            kw["project"] = t[4:] or "mlp"
        elif t in ("nst", "max", "soft", "recur", "recurhard"):
            kw["label_infer"] = t
        elif t.startswith("label_") and t[6:] in ("nst", "recur", "recurhard"):
            # the reference sample grammar joins with '_' inside one segment:
            # 'label_nst' / 'label_recur' / 'label_recurhard'
            # (tensorflow/config/head.py:124-126; dispatch at
            # models/heads/head.py:489-527) — accept the published spelling
            kw["label_infer"] = t[6:]
        elif re.match(r"^nn\d+$", t):
            kw["extra_pos_nn"] = int(t[2:])
        elif re.match(r"^rand\d+$", t):
            kw["extra_neg_rand"] = int(t[4:])
        elif re.match(r"^[UDud]?[0-9a]+$", t):
            stages = tuple(i for _, i in parse_stage(t, num_layers))
        else:
            raise ValueError(f"unknown contrast token {t!r} in {ops!r}")
    if stages is not None:
        kw["stages"] = stages
    else:
        kw["stages"] = tuple(range(num_layers))
    return ContrastConfig(**kw)


_DROP_RE = re.compile(r"^dp(\d*\.?\d+|\.\d+)$")


def parse_mlp_ops(ops: str) -> dict:
    """Parse the plain-head op-string '<depth>-<loss>[-dp<p>][-w<f>]'
    (reference `mlp` head grammar, tensorflow/config/head.py:56-82):
    depth = latent-tower depth (f_out → latent, '2-xen' = 2 layers),
    loss ∈ xen | sigmoid | none, 'dp<p>' = dropout on the latent
    (applied at models/heads/head.py:273-274), 'w<f>' = float loss weight.

    'class' = per-class loss re-weighting. The reference grammar accepts it
    (config/head.py:71) and dispatches to `get_class_weight(config.dataset,
    labels)` at models/heads/head.py:326 — but that function is UNDEFINED
    anywhere in the reference (the call would NameError; the only related
    code is a commented-out potential update, datasets/base.py:513). We give
    the token working semantics: inverse-frequency weights from the train
    split's label histogram (losses/segmentation.py::
    inverse_frequency_weights), the standard class-imbalance recipe.
    'center' stays raising — it shares the same dead reference symbol and
    has no recoverable semantics (no geometry is available at the loss
    site)."""
    tokens = ops.split("-")
    if tokens and tokens[0] == "mlp":
        tokens = tokens[1:]
    out = {"depth": 1, "loss": "xen", "drop": None, "weight": 1.0,
           "class_weight": False}
    for t in tokens:
        if not t:
            continue
        if t.isdigit():
            out["depth"] = int(t)
        elif t in ("xen", "sigmoid", "none"):
            out["loss"] = t
        elif _DROP_RE.match(t):
            out["drop"] = float(_DROP_RE.match(t).group(1))
        elif _WEIGHT_RE.match(t):
            out["weight"] = float(_WEIGHT_RE.match(t).group(1))
        elif t == "class":
            out["class_weight"] = True
        elif t == "center":
            raise NotImplementedError(
                "mlp-head weight 'center': dead grammar — the reference "
                "dispatches to get_class_weight (tensorflow/models/heads/"
                "head.py:326) which is undefined in the reference codebase"
            )
        elif t == "pred":
            pass  # parsed and ignored, like the reference (config/head.py:81)
        else:
            raise ValueError(f"unknown mlp-head token {t!r} in {ops!r}")
    return out


_BRANCH_LOSS_RE = re.compile(r"^(loss(?:Sub)?)((?:\d*\.)?\d+)?$")
_CONDITION_RE = re.compile(r"^(concat|sum|max)(\d+|A)$")


def parse_multi_ops(ops: str, num_layers: int = 5) -> dict:
    """Parse 'multi-Ua-concat-latent' → {'stages', 'combine', 'ftype', ...}
    (reference config/head.py:84-111; the head itself at
    tensorflow/models/heads/head.py:338-459 takes branch|condition|main
    segments).

    Tokens beyond the published main path:
      - ftype: latent | logits | probs | fout (f_out) — what the per-stage
        branches expose to the main combine.
      - combine: concat | concatmlp | sum.
      - branch loss: 'loss<w>' (per-stage logits upsampled to U0, full-label
        xen) or 'lossSub<w>' (stage-local sub-scene soft-label xen,
        head.py:303-317), e.g. 'lossSub.5' — the reference branch segment
        'Ua-lossSub.5'.
      - condition: '<ops><i|A>' e.g. 'concat1' / 'sumA' — combine the
        previous i (or All) deeper stages' latents into each stage before
        predicting (head.py:425-447 combine_condition).
    """
    tokens = ops.split("-")
    if tokens and tokens[0] == "multi":
        tokens = tokens[1:]
    out = {
        "stages": tuple(range(num_layers)),
        "combine": "concat",
        "ftype": "latent",
        "branch_loss": "",
        "branch_weight": 1.0,
        "condition": "",
        "sep_head": False,
    }
    for t in tokens:
        if not t:
            continue
        if t in ("concat", "concatmlp", "sum"):
            out["combine"] = t
        elif t == "sep":
            # separate decoder branches per head (reference sep_head,
            # tensorflow/models/heads/seg_head.py:93-102; see MultiHead)
            out["sep_head"] = True
        elif t in ("latent", "logits", "probs", "f_out", "fout"):
            out["ftype"] = "f_out" if t == "fout" else t
        elif _BRANCH_LOSS_RE.match(t):
            m = _BRANCH_LOSS_RE.match(t)
            out["branch_loss"] = m.group(1)
            if m.group(2):
                out["branch_weight"] = float(m.group(2))
        elif _CONDITION_RE.match(t):
            out["condition"] = t
        elif re.match(r"^[UDud]?[0-9a]+$", t):
            out["stages"] = tuple(i for _, i in parse_stage(t, num_layers))
        else:
            raise ValueError(f"unknown multi token {t!r} in {ops!r}")
    return out


def parse_arch_out(arch_out: str, num_layers: int = 5) -> dict:
    """Split a full head spec 'multi-...|contrast-...' into parsed heads
    (the reference's `arch_out` joined with '|', config/s3dis.py:147-185)."""
    heads: dict = {}
    for pos, seg in enumerate(arch_out.split("|")):
        seg = seg.strip()
        if not seg:
            continue
        if seg.startswith("multi"):
            heads["multi"] = parse_multi_ops(seg, num_layers)
        elif seg.startswith("contrast"):
            heads["contrast"] = parse_contrast_ops(seg, num_layers)
        elif seg.startswith("mlp") or re.match(r"^\d+-", seg):
            heads["mlp"] = parse_mlp_ops(seg)
        elif pos == 0:
            # the reference's leading segment selects the backbone/local
            # aggregation ('', 'pospool', 'adapt', …) — config/s3dis.py:147-185
            heads["backbone"] = seg
        else:
            raise ValueError(f"unknown head segment {seg!r}")
    return heads
