"""Torch -> JAX weight importer for reference NopeSAC checkpoints.

Maps the reference's parameter names (d2 ResNet + PlaneTR/matching/camera
heads, see SURVEY.md section 3.4) onto the flax parameter tree, with layout
conversions:
  * conv kernels: OIHW -> HWIO
  * linear kernels: [out, in] -> [in, out]
  * torch MultiheadAttention packed in_proj -> separate q/k/v Dense
  * fc layers after NCHW flatten -> permuted for NHWC flatten
    (camera head fc_trans/fc_rots, camera_head.py:113-114)

Also applies the reference's own key migration (planeTR_head.py:26-48:
`sem_seg_head.*` -> `sem_seg_head.pixel_decoder.*` for old checkpoints).
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def t_conv(w: np.ndarray) -> np.ndarray:
    """OIHW -> HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def t_linear(w: np.ndarray) -> np.ndarray:
    """[out, in] -> [in, out]."""
    return np.transpose(w, (1, 0))


def t_linear_after_flatten(w: np.ndarray, c: int, h: int, wd: int) -> np.ndarray:
    """Linear applied after torch .flatten(1) of a [B, C, H, W] tensor, being
    imported for an NHWC flatten: permute the input axis CHW -> HWC."""
    out_dim = w.shape[0]
    w4 = w.reshape(out_dim, c, h, wd)
    w4 = np.transpose(w4, (0, 2, 3, 1)).reshape(out_dim, c * h * wd)
    return t_linear(w4)


def split_qkv(in_proj_weight: np.ndarray, in_proj_bias: np.ndarray):
    """torch MHA packed [3*d, d] -> three ([d, d] kernel.T, [d] bias)."""
    d = in_proj_weight.shape[1]
    ws = np.split(in_proj_weight, 3, axis=0)
    bs = np.split(in_proj_bias, 3, axis=0)
    return [(t_linear(w), b) for w, b in zip(ws, bs)]


def migrate_legacy_keys(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """planeTR_head.py:26-48 key migration for v1 checkpoints."""
    out = {}
    for k, v in state.items():
        nk = k
        if "sem_seg_head" in k and ".predictor" not in k and ".pixel_decoder." not in k:
            # legacy layout stored pixel-decoder weights directly under the head
            prefix = "sem_seg_head."
            if k.startswith(prefix) and not any(
                k.startswith(prefix + p) for p in (
                    "input_proj", "context_SA", "query_embed", "context2plane_decoder",
                    "top_down", "plane_embedding", "pixel_embedding", "plane_prob",
                    "plane_param", "plane_center", "pixel_plane_center", "depth",
                    "position_embedding", "pixel_decoder",
                )
            ):
                nk = k.replace(prefix, prefix + "pixel_decoder.")
        out[nk] = v
    return out


def _set(tree: dict, path: str, value: np.ndarray, strict: bool):
    node = tree
    parts = path.split("/")
    for p in parts[:-1]:
        if p not in node:
            if strict:
                raise KeyError(f"missing branch {p} in {path}")
            return False
        node = node[p]
    leaf = parts[-1]
    if leaf not in node:
        if strict:
            raise KeyError(f"missing leaf {path}")
        return False
    if node[leaf].shape != value.shape:
        raise ValueError(f"shape mismatch at {path}: {node[leaf].shape} vs {value.shape}")
    node[leaf] = value.astype(np.float32)
    return True


def _resnet_mapping() -> Dict[str, str]:
    """d2 ResNet names -> flax paths (kernels handled separately)."""
    m = {
        "backbone.stem.conv1.weight": "backbone/stem_conv1/kernel",
        "backbone.stem.conv1.norm.weight": "backbone/stem_bn1/scale",
        "backbone.stem.conv1.norm.bias": "backbone/stem_bn1/bias",
        "backbone.stem.conv1.norm.running_mean": "backbone/stem_bn1/mean",
        "backbone.stem.conv1.norm.running_var": "backbone/stem_bn1/var",
    }
    blocks = {2: 3, 3: 4, 4: 6, 5: 3}
    for stage, n in blocks.items():
        for b in range(n):
            src = f"backbone.res{stage}.{b}"
            dst = f"backbone/res{stage}_{b}"
            for ci in (1, 2, 3):
                m[f"{src}.conv{ci}.weight"] = f"{dst}/conv{ci}/kernel"
                m[f"{src}.conv{ci}.norm.weight"] = f"{dst}/bn{ci}/scale"
                m[f"{src}.conv{ci}.norm.bias"] = f"{dst}/bn{ci}/bias"
                m[f"{src}.conv{ci}.norm.running_mean"] = f"{dst}/bn{ci}/mean"
                m[f"{src}.conv{ci}.norm.running_var"] = f"{dst}/bn{ci}/var"
            m[f"{src}.shortcut.weight"] = f"{dst}/shortcut_conv/kernel"
            m[f"{src}.shortcut.norm.weight"] = f"{dst}/shortcut_bn/scale"
            m[f"{src}.shortcut.norm.bias"] = f"{dst}/shortcut_bn/bias"
            m[f"{src}.shortcut.norm.running_mean"] = f"{dst}/shortcut_bn/mean"
            m[f"{src}.shortcut.norm.running_var"] = f"{dst}/shortcut_bn/var"
    return m


def _stack_layers(state: Dict[str, np.ndarray], fmt: str, n: int, transform):
    """Collect per-layer tensors fmt.format(i) for i in 0..n-1 and stack along
    a new leading axis (my transformer stacks are lax.scan-ed)."""
    vals = []
    for i in range(n):
        k = fmt.format(i)
        if k not in state:
            return None
        vals.append(transform(state[k]))
    return np.stack(vals, axis=0)


def _import_detr_stack(state, tree, torch_prefix, flax_prefix, n_layers,
                       has_cross: bool, strict: bool):
    """torch TransformerEncoder/Decoder layers -> scanned flax stack.

    torch layer fields: self_attn.{in_proj_weight,in_proj_bias,out_proj.*},
    (multihead_attn.* for decoders), linear1/2, norm1/2(/3).
    flax (scanned): layers/layer/{self_attn,cross_attn}/{q,k,v,out}_proj,
    linear1/2, norm1/2(/3) - all with a leading [n_layers] axis.
    """
    count = 0

    def put(dst, arr):
        nonlocal count
        if arr is not None and _set(tree, dst, arr, strict):
            count += 1

    for attn_t, attn_f in ((("self_attn",), "self_attn"),
                           (("multihead_attn",), "cross_attn"))[: 2 if has_cross else 1]:
        at = attn_t[0]
        # packed qkv -> split, per layer, stacked
        for qkv_i, name in enumerate(("q_proj", "k_proj", "v_proj")):
            w = _stack_layers(
                state, f"{torch_prefix}.layers.{{0}}.{at}.in_proj_weight", n_layers,
                lambda x, j=qkv_i: t_linear(np.split(x, 3, axis=0)[j]))
            put(f"{flax_prefix}/layer/{attn_f}/{name}/kernel", w)
            b = _stack_layers(
                state, f"{torch_prefix}.layers.{{0}}.{at}.in_proj_bias", n_layers,
                lambda x, j=qkv_i: np.split(x, 3, axis=0)[j])
            put(f"{flax_prefix}/layer/{attn_f}/{name}/bias", b)
        put(f"{flax_prefix}/layer/{attn_f}/out_proj/kernel",
            _stack_layers(state, f"{torch_prefix}.layers.{{0}}.{at}.out_proj.weight",
                          n_layers, t_linear))
        put(f"{flax_prefix}/layer/{attn_f}/out_proj/bias",
            _stack_layers(state, f"{torch_prefix}.layers.{{0}}.{at}.out_proj.bias",
                          n_layers, lambda x: x))

    for lin in ("linear1", "linear2"):
        put(f"{flax_prefix}/layer/{lin}/kernel",
            _stack_layers(state, f"{torch_prefix}.layers.{{0}}.{lin}.weight",
                          n_layers, t_linear))
        put(f"{flax_prefix}/layer/{lin}/bias",
            _stack_layers(state, f"{torch_prefix}.layers.{{0}}.{lin}.bias",
                          n_layers, lambda x: x))
    n_norms = 3 if has_cross else 2
    for ni in range(1, n_norms + 1):
        put(f"{flax_prefix}/layer/norm{ni}/scale",
            _stack_layers(state, f"{torch_prefix}.layers.{{0}}.norm{ni}.weight",
                          n_layers, lambda x: x))
        put(f"{flax_prefix}/layer/norm{ni}/bias",
            _stack_layers(state, f"{torch_prefix}.layers.{{0}}.norm{ni}.bias",
                          n_layers, lambda x: x))
    return count


def _import_conv_bn(state, tkey, fkey, put, put_bs):
    """torch Sequential(Conv2d(bias=False), BatchNorm2d, act) -> flax ConvBN.

    Conv kernel + BN affine go to params; BN running stats go to the
    batch_stats collection (flax nn.BatchNorm keeps them separate).
    """
    if f"{tkey}.0.weight" in state:
        put(f"{fkey}/Conv_0/kernel", t_conv(state[f"{tkey}.0.weight"]))
    put(f"{fkey}/BatchNorm_0/scale", state.get(f"{tkey}.1.weight"))
    put(f"{fkey}/BatchNorm_0/bias", state.get(f"{tkey}.1.bias"))
    put_bs(f"{fkey}/BatchNorm_0/mean", state.get(f"{tkey}.1.running_mean"))
    put_bs(f"{fkey}/BatchNorm_0/var", state.get(f"{tkey}.1.running_var"))


class _TrackedState(dict):
    """Checkpoint state dict that records which source keys were read.

    Every mapping rule in this module reads through `state[k]` / `state.get`,
    so the consumed set is exactly the reference tensors a rule touched —
    the complement (unconsumed) is what a released-checkpoint-shaped file
    would silently drop. Used by `import_torch_weights(return_report=True)`.
    """

    def __init__(self, data):
        super().__init__(data)
        self.consumed = set()

    def __getitem__(self, k):
        self.consumed.add(k)
        return super().__getitem__(k)

    def get(self, k, default=None):
        if super().__contains__(k):
            self.consumed.add(k)
        return super().get(k, default)


def import_torch_weights(params, path: str, strict: bool = False,
                         batch_stats=None, return_report: bool = False):
    """Import a reference checkpoint into the flax params tree.

    Covers: d2 ResNet-50 backbone (exact), PlaneTR head (input proj,
    encoder/decoder stacks incl. packed-qkv split, top_down(+depth) FPN,
    output MLPs), matching head (scanned GNN pairs), camera head
    (MaskFormer pixel decoder, convs_backbone/trans/rots stacks, AIM +
    refine MLPs, shared trans/rots). Unmatched tensors are reported.

    When `batch_stats` (the flax batch_stats collection) is passed, BN
    running means/vars of the trainable-BN modules (plane-head top_down /
    top_down_depth, camera conv stacks — the reference's nn.BatchNorm2d at
    planeTR_head.py:209-215 and camera_modules.py:36-48) are imported into
    it and the function returns `(params, batch_stats)`. Without it only
    the params tree is returned and running stats keep their init values —
    fine for training from scratch, WRONG for eval of a trained torch
    checkpoint.
    """
    import copy

    import jax

    from ..engine.checkpoint import load_torch_checkpoint

    state = _TrackedState(migrate_legacy_keys(load_torch_checkpoint(path)))
    tree = jax.tree_util.tree_map(np.asarray, jax.device_get(params))
    tree = copy.deepcopy(tree)
    bstats = None
    if batch_stats is not None:
        bstats = jax.tree_util.tree_map(np.asarray, jax.device_get(batch_stats))
        bstats = copy.deepcopy(bstats)

    n_loaded = 0

    def put(dst, v):
        nonlocal n_loaded
        if v is not None and _set(tree, dst, v, strict):
            n_loaded += 1

    def put_bs(dst, v):
        nonlocal n_loaded
        if bstats is not None and v is not None and _set(bstats, dst, v, strict):
            n_loaded += 1

    # ---- backbone
    for src, dst in _resnet_mapping().items():
        if src not in state:
            continue
        v = state[src]
        if dst.endswith("/kernel"):
            v = t_conv(v)
        put(dst, v)

    # ---- PlaneTR head
    ph = "plane_head"
    put(f"{ph}/input_proj/kernel", t_conv(state.get("sem_seg_head.input_proj.weight"))
        if "sem_seg_head.input_proj.weight" in state else None)
    put(f"{ph}/input_proj/bias", state.get("sem_seg_head.input_proj.bias"))
    put(f"{ph}/query_embed", state.get("sem_seg_head.query_embed.weight"))
    n_loaded += _import_detr_stack(state, tree, "sem_seg_head.context_SA",
                                   f"{ph}/context_sa/layers", 6, False, strict)
    put(f"{ph}/context_sa/norm/scale", state.get("sem_seg_head.context_SA.norm.weight"))
    put(f"{ph}/context_sa/norm/bias", state.get("sem_seg_head.context_SA.norm.bias"))
    n_loaded += _import_detr_stack(state, tree, "sem_seg_head.context2plane_decoder",
                                   f"{ph}/decoder/layers", 6, True, strict)
    put(f"{ph}/decoder/norm/scale",
        state.get("sem_seg_head.context2plane_decoder.norm.weight"))
    put(f"{ph}/decoder/norm/bias",
        state.get("sem_seg_head.context2plane_decoder.norm.bias"))

    # top_down(+depth) laterals + up convs (conv_bn_relu: 0=conv, 1=bn,
    # planeTR_head.py:209-252); m_conv_dict.m4 is the encoder-memory inject
    for td in ("top_down", "top_down_depth"):
        for name in ("c1_conv", "c2_conv", "c3_conv", "c4_conv",
                     "up_conv1", "up_conv2", "up_conv3"):
            _import_conv_bn(state, f"sem_seg_head.{td}.{name}",
                            f"{ph}/{td}/{name}", put, put_bs)
        _import_conv_bn(state, f"sem_seg_head.{td}.m_conv_dict.m4",
                        f"{ph}/{td}/m4_conv", put, put_bs)
    put(f"{ph}/depth/kernel", t_conv(state["sem_seg_head.depth.weight"])
        if "sem_seg_head.depth.weight" in state else None)
    put(f"{ph}/depth/bias", state.get("sem_seg_head.depth.bias"))

    # output heads (MLPs: layers.i.weight/bias -> Dense_i)
    for tname, fname, depth in (("plane_embedding", "plane_embedding", 3),
                                ("plane_param", "plane_param", 3),
                                ("plane_center", "plane_center", 3)):
        for i in range(depth):
            put(f"{ph}/{fname}/Dense_{i}/kernel",
                t_linear(state[f"sem_seg_head.{tname}.layers.{i}.weight"])
                if f"sem_seg_head.{tname}.layers.{i}.weight" in state else None)
            put(f"{ph}/{fname}/Dense_{i}/bias",
                state.get(f"sem_seg_head.{tname}.layers.{i}.bias"))
    put(f"{ph}/plane_prob/kernel", t_linear(state["sem_seg_head.plane_prob.weight"])
        if "sem_seg_head.plane_prob.weight" in state else None)
    put(f"{ph}/plane_prob/bias", state.get("sem_seg_head.plane_prob.bias"))
    put(f"{ph}/pixel_embedding/kernel",
        t_conv(state["sem_seg_head.pixel_embedding.weight"])
        if "sem_seg_head.pixel_embedding.weight" in state else None)
    put(f"{ph}/pixel_embedding/bias", state.get("sem_seg_head.pixel_embedding.bias"))
    put(f"{ph}/pixel_plane_center/kernel",
        t_conv(state["sem_seg_head.pixel_plane_center.weight"])
        if "sem_seg_head.pixel_plane_center.weight" in state else None)
    put(f"{ph}/pixel_plane_center/bias", state.get("sem_seg_head.pixel_plane_center.bias"))

    # ---- matching head (scanned GNN pairs: self{i}/cross{i} -> layer 2i/2i+1)
    mh = "matching_head"
    put(f"{mh}/plane_app_proj/kernel",
        t_linear(state["matching_head.planeApp_proj.weight"][:, :, 0])
        if "matching_head.planeApp_proj.weight" in state else None)
    put(f"{mh}/plane_app_proj/bias", state.get("matching_head.planeApp_proj.bias"))
    put(f"{mh}/plane_desc_proj/kernel",
        t_linear(state["matching_head.planeDesc_proj.weight"][:, :, 0])
        if "matching_head.planeDesc_proj.weight" in state else None)
    put(f"{mh}/plane_desc_proj/bias", state.get("matching_head.planeDesc_proj.bias"))
    put(f"{mh}/bin_score", state.get("matching_head.bin_score"))

    gnn_fields = (("q_proj", "q_proj"), ("k_proj", "k_proj"), ("v_proj", "v_proj"),
                  ("merge", "merge"), ("mlp.0", "mlp1"), ("mlp.2", "mlp2"))
    for role, off in (("self_layer", 0), ("cross_layer", 1)):
        for tsrc, fdst in gnn_fields:
            w = _stack_layers(
                state, "matching_head.gnn.layers.{0}." + tsrc + ".weight", 18,
                t_linear)
            if w is not None:
                put(f"{mh}/gnn/pairs/{role}/{fdst}/kernel", w[off::2])
        for ni in (1, 2):
            w = _stack_layers(
                state, "matching_head.gnn.layers.{0}.norm%d.weight" % ni, 18,
                lambda x: x)
            b = _stack_layers(
                state, "matching_head.gnn.layers.{0}.norm%d.bias" % ni, 18,
                lambda x: x)
            if w is not None:
                put(f"{mh}/gnn/pairs/{role}/norm{ni}/scale", w[off::2])
                put(f"{mh}/gnn/pairs/{role}/norm{ni}/bias", b[off::2])

    # ---- camera head
    chp = "camera_head"
    cam = "camera_head_list.0"
    # MaskFormer pixel decoder over res3..res5 (camera_modules.py:246-353):
    # reference names layer_{idx+1}/adapter_{idx+1} with idx over channel-
    # sorted [res3,res4,res5]; d2 Conv2d stores its GN as `.norm`
    pd_map = {"layer_3": "layer_res5", "adapter_2": "adapter_res4",
              "layer_2": "layer_res4", "adapter_1": "adapter_res3",
              "layer_1": "layer_res3"}
    for tsrc, fdst in pd_map.items():
        put(f"{chp}/pixel_decoder/{fdst}/Conv_0/kernel",
            t_conv(state[f"{cam}.pixel_decoder.{tsrc}.weight"])
            if f"{cam}.pixel_decoder.{tsrc}.weight" in state else None)
        put(f"{chp}/pixel_decoder/{fdst}/GroupNorm_0/scale",
            state.get(f"{cam}.pixel_decoder.{tsrc}.norm.weight"))
        put(f"{chp}/pixel_decoder/{fdst}/GroupNorm_0/bias",
            state.get(f"{cam}.pixel_decoder.{tsrc}.norm.bias"))
    put(f"{chp}/pixel_decoder/mask_features/kernel",
        t_conv(state[f"{cam}.pixel_decoder.mask_features.weight"])
        if f"{cam}.pixel_decoder.mask_features.weight" in state else None)
    put(f"{chp}/pixel_decoder/mask_features/bias",
        state.get(f"{cam}.pixel_decoder.mask_features.bias"))
    # conv2d(+BN+LeakyReLU) stacks (camera_head.py:78-112); torch Sequential
    # indices skip the parameterless MaxPool slots in convs_backbone
    for sname, idxs in (("convs_backbone", (0, 1, 3, 4, 6, 7)),
                        ("convs_trans", range(6)), ("convs_rots", range(6))):
        for ci, ti in enumerate(idxs):
            _import_conv_bn(state, f"{cam}.{sname}.{ti}",
                            f"{chp}/{sname}/conv{ci}", put, put_bs)
    # shared pose regressors
    put(f"{chp}/trans/kernel", t_linear(state[f"{cam}.trans.weight"])
        if f"{cam}.trans.weight" in state else None)
    put(f"{chp}/trans/bias", state.get(f"{cam}.trans.bias"))
    put(f"{chp}/rots/kernel", t_linear(state[f"{cam}.rots.weight"])
        if f"{cam}.rots.weight" in state else None)
    put(f"{chp}/rots/bias", state.get(f"{cam}.rots.bias"))
    # fc after NCHW flatten of [128, 2, 3]
    for fc in ("fc_trans", "fc_rots"):
        k = f"{cam}.{fc}.weight"
        if k in state:
            put(f"{chp}/{fc}/kernel", t_linear_after_flatten(state[k], 128, 2, 3))
        put(f"{chp}/{fc}/bias", state.get(f"{cam}.{fc}.bias"))
    # AIM + refine MLPs
    mlp_map = {"rot_emb_proj": 6, "trans_emb_proj": 6, "geo_encoder": 6,
               "geo_proj_s1": 3, "decoder_rot": 6, "geo_proj_s2": 3,
               "decoder_tran": 6, "decoder_rot2": 3, "decoder_tran2": 3,
               "normal_score_proj": 3, "param_score_proj": 3}
    for mname, depth in mlp_map.items():
        for i in range(depth):
            put(f"{chp}/{mname}/Dense_{i}/kernel",
                t_linear(state[f"{cam}.{mname}.layers.{i}.weight"])
                if f"{cam}.{mname}.layers.{i}.weight" in state else None)
            put(f"{chp}/{mname}/Dense_{i}/bias",
                state.get(f"{cam}.{mname}.layers.{i}.bias"))
    for reg in ("rot_score_reg", "trans_score_reg"):
        put(f"{chp}/{reg}/kernel", t_linear(state[f"{cam}.{reg}.weight"])
            if f"{cam}.{reg}.weight" in state else None)
        put(f"{chp}/{reg}/bias", state.get(f"{cam}.{reg}.bias"))

    import logging

    logging.getLogger(__name__).info(
        "imported %d tensors (of %d in checkpoint) from %s",
        n_loaded, len(state), path,
    )
    out = (tree, bstats) if bstats is not None else tree
    if return_report:
        report = {
            "n_loaded": n_loaded,
            "n_checkpoint": len(state),
            "unconsumed": sorted(set(state) - state.consumed),
        }
        return (*out, report) if isinstance(out, tuple) else (out, report)
    return out
