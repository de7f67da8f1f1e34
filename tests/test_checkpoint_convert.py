"""Checkpoint converter test: build a synthetic torch-layout state dict with
the reference's exact parameter names/shapes, convert, and check the result
matches our model's init-param tree structure leaf-for-leaf — and that
FrozenBN folding reproduces the reference's forward affine."""

import numpy as np
import pytest

import sys
sys.path.insert(0, "tools")

from convert_checkpoint import convert_state_dict, STAGE_BLOCKS


def synth_reference_state_dict(rng, backbone="resnet50"):
    """Reference-named random state dict for the shipped config."""
    sd = {}

    def lin(prefix, i, o):
        # fan-in scaling so the converted net produces finite activations
        sd[prefix + ".weight"] = (rng.randn(o, i) / np.sqrt(i)).astype(np.float32)
        sd[prefix + ".bias"] = (rng.randn(o) * 0.01).astype(np.float32)

    def conv(prefix, i, o, k, bias=True):
        sd[prefix + ".weight"] = (rng.randn(o, i, k, k) / np.sqrt(i * k * k)).astype(np.float32)
        if bias:
            sd[prefix + ".bias"] = (rng.randn(o) * 0.01).astype(np.float32)

    def bn(prefix, c):
        sd[prefix + ".weight"] = rng.rand(c).astype(np.float32) + 0.5
        sd[prefix + ".bias"] = (rng.randn(c) * 0.01).astype(np.float32)
        sd[prefix + ".running_mean"] = (rng.randn(c) * 0.01).astype(np.float32)
        sd[prefix + ".running_var"] = rng.rand(c).astype(np.float32) + 0.5

    def norm(prefix, c):
        sd[prefix + ".weight"] = rng.rand(c).astype(np.float32) + 0.5
        sd[prefix + ".bias"] = rng.randn(c).astype(np.float32)

    def mha(prefix, c):
        sd[prefix + ".in_proj_weight"] = (rng.randn(3 * c, c) / np.sqrt(c)).astype(np.float32)
        sd[prefix + ".in_proj_bias"] = (rng.randn(3 * c) * 0.01).astype(np.float32)
        lin(prefix + ".out_proj", c, c)

    def msda(prefix, c=256):
        lin(prefix + ".sampling_offsets", c, 8 * 4 * 4 * 2)
        lin(prefix + ".attention_weights", c, 8 * 4 * 4)
        lin(prefix + ".value_proj", c, c)
        lin(prefix + ".output_proj", c, c)

    def mlp(prefix, dims):
        for i, (a, b) in enumerate(zip(dims[:-1], dims[1:])):
            lin(f"{prefix}.layers.{i}", a, b)

    # backbone
    bb = "backbone.0.body."
    conv(bb + "conv1", 3, 64, 7, bias=False)
    bn(bb + "bn1", 64)
    width = 64
    in_c = 64
    for stage, n_blocks in enumerate(STAGE_BLOCKS[backbone]):
        for b in range(n_blocks):
            pre = f"{bb}layer{stage + 1}.{b}"
            conv(pre + ".conv1", in_c if b == 0 else width * 4, width, 1, bias=False)
            bn(pre + ".bn1", width)
            conv(pre + ".conv2", width, width, 3, bias=False)
            bn(pre + ".bn2", width)
            conv(pre + ".conv3", width, width * 4, 1, bias=False)
            bn(pre + ".bn3", width * 4)
            if b == 0:
                conv(pre + ".downsample.0", in_c, width * 4, 1, bias=False)
                bn(pre + ".downsample.1", width * 4)
        in_c = width * 4
        width *= 2

    # input projections
    for i, c_in in enumerate([512, 1024, 2048, 2048]):
        conv(f"input_proj.{i}.0", c_in, 256, 1 if i < 3 else 3)
        norm(f"input_proj.{i}.1", 256)

    # depth predictor
    dp = "depth_predictor."
    # depth predictor consumes the 256-ch projected srcs (monodetr.py:201)
    for name, cin, k in [("proj", 256, 1), ("upsample", 256, 1), ("downsample", 256, 3)]:
        conv(f"{dp}{name}.0", cin, 256, k)
        norm(f"{dp}{name}.1", 256)
    conv(dp + "depth_head.0", 256, 256, 3)
    norm(dp + "depth_head.1", 256)
    conv(dp + "depth_head.3", 256, 256, 3)
    norm(dp + "depth_head.4", 256)
    conv(dp + "depth_classifier", 256, 81, 1)
    enc = dp + "depth_encoder.layers.0."
    mha(enc + "self_attn", 256)
    norm(enc + "norm1", 256)
    norm(enc + "norm2", 256)
    lin(enc + "linear1", 256, 256)
    lin(enc + "linear2", 256, 256)
    sd[dp + "depth_pos_embed.weight"] = (rng.randn(61, 256) * 0.1).astype(np.float32)

    # transformer
    tr = "depthaware_transformer."
    sd[tr + "level_embed"] = (rng.randn(4, 256) * 0.1).astype(np.float32)
    lin(tr + "reference_points", 256, 2)
    for i in range(3):
        e = f"{tr}encoder.layers.{i}."
        msda(e + "self_attn")
        norm(e + "norm1", 256)
        lin(e + "linear1", 256, 256)
        lin(e + "linear2", 256, 256)
        norm(e + "norm2", 256)
    for i in range(3):
        d = f"{tr}decoder.layers.{i}."
        msda(d + "cross_attn")
        norm(d + "norm1", 256)
        mha(d + "cross_attn_depth", 256)
        norm(d + "norm_depth", 256)
        mha(d + "self_attn", 256)
        norm(d + "norm2", 256)
        for nm in ["sa_qcontent_proj", "sa_qpos_proj", "sa_kcontent_proj",
                   "sa_kpos_proj", "sa_v_proj"]:
            lin(d + nm, 256, 256)
        lin(d + "linear1", 256, 256)
        lin(d + "linear2", 256, 256)
        norm(d + "norm3", 256)

    sd["query_embed.weight"] = (rng.randn(550, 512) * 0.1).astype(np.float32)
    sd["label_enc.weight"] = rng.randn(4, 255).astype(np.float32)  # dead (DN)
    for i in range(3):
        lin(f"class_embed.{i}", 256, 3)
        mlp(f"bbox_embed.{i}", [256, 256, 256, 6])
        mlp(f"dim_embed_3d.{i}", [256, 256, 3])
        mlp(f"angle_embed.{i}", [256, 256, 24])
        mlp(f"depth_embed.{i}", [256, 256, 2])
    return sd


def tree_paths(tree, prefix=()):
    if isinstance(tree, dict):
        out = {}
        for k, v in tree.items():
            out.update(tree_paths(v, prefix + (k,)))
        return out
    return {prefix: np.shape(tree)}


@pytest.mark.slow
def test_convert_matches_model_tree():
    import jax
    import jax.numpy as jnp
    from monodetr_tpu.models import MonoDETR

    rng = np.random.RandomState(0)
    sd = synth_reference_state_dict(rng)
    converted = convert_state_dict(sd)

    model = MonoDETR()
    images = jnp.zeros((1, 64, 128, 3))
    calibs = jnp.eye(3, 4)[None]
    sizes = jnp.asarray([[1242.0, 375.0]])
    params = jax.jit(lambda r: model.init(r, images, calibs, sizes, train=False))(
        jax.random.PRNGKey(0)
    )

    want = tree_paths(jax.tree_util.tree_map(np.asarray, params))
    got = tree_paths(converted)
    missing = set(want) - set(got)
    extra = set(got) - set(want)
    assert not missing, sorted(missing)[:8]
    assert not extra, sorted(extra)[:8]
    for k in want:
        assert want[k] == got[k], (k, want[k], got[k])

    # converted params actually run through the model
    out = model.apply(converted, images, calibs, sizes, train=False)
    assert np.isfinite(np.asarray(out["pred_boxes"])).all()


def test_frozen_bn_folding():
    rng = np.random.RandomState(1)
    sd = {}
    c = 8
    sd["x.weight"] = rng.rand(c).astype(np.float32) + 0.5
    sd["x.bias"] = rng.randn(c).astype(np.float32)
    sd["x.running_mean"] = rng.randn(c).astype(np.float32)
    sd["x.running_var"] = rng.rand(c).astype(np.float32) + 0.5

    from convert_checkpoint import _frozen_bn

    folded = _frozen_bn(sd, "x")
    x = rng.randn(4, c).astype(np.float32)
    # reference forward (backbone.py:54-64)
    eps = 1e-5
    scale = sd["x.weight"] * (sd["x.running_var"] + eps) ** -0.5
    want = x * scale + (sd["x.bias"] - sd["x.running_mean"] * scale)
    got = x * folded["scale"] + folded["bias"]
    np.testing.assert_allclose(got, want, rtol=1e-5)


def synth_torchvision_state_dict(rng, backbone="resnet50"):
    """Random state dict in plain torchvision resnet layout (incl. fc)."""
    sd = {}

    def conv(prefix, i, o, k):
        sd[prefix + ".weight"] = (
            rng.randn(o, i, k, k) / np.sqrt(i * k * k)).astype(np.float32)

    def bn(prefix, c):
        sd[prefix + ".weight"] = rng.rand(c).astype(np.float32) + 0.5
        sd[prefix + ".bias"] = (rng.randn(c) * 0.01).astype(np.float32)
        sd[prefix + ".running_mean"] = (rng.randn(c) * 0.01).astype(np.float32)
        sd[prefix + ".running_var"] = rng.rand(c).astype(np.float32) + 0.5
        sd[prefix + ".num_batches_tracked"] = np.array(1000)

    conv("conv1", 3, 64, 7)
    bn("bn1", 64)
    c_in = 64
    for stage, n_blocks in enumerate(STAGE_BLOCKS[backbone]):
        width = 64 * 2 ** stage
        for b in range(n_blocks):
            p = f"layer{stage + 1}.{b}"
            conv(p + ".conv1", c_in if b == 0 else width * 4, width, 1)
            bn(p + ".bn1", width)
            conv(p + ".conv2", width, width, 3)
            bn(p + ".bn2", width)
            conv(p + ".conv3", width, width * 4, 1)
            bn(p + ".bn3", width * 4)
            if b == 0:
                conv(p + ".downsample.0", c_in, width * 4, 1)
                bn(p + ".downsample.1", width * 4)
        c_in = width * 4
    sd["fc.weight"] = rng.randn(1000, 2048).astype(np.float32)
    sd["fc.bias"] = rng.randn(1000).astype(np.float32)
    return sd


def test_torchvision_backbone_import():
    """ImageNet-init path (reference backbone.py:100-102): a torchvision
    resnet50 state dict converts to a backbone-only partial checkpoint that
    merges into the model's init params leaf-for-leaf."""
    import jax
    import jax.numpy as jnp

    from convert_checkpoint import convert_torchvision_backbone
    from monodetr_tpu.models.backbone import ResNetBackbone
    from monodetr_tpu.train.checkpoint import merge_params

    rng = np.random.RandomState(5)
    sd = synth_torchvision_state_dict(rng)
    partial = convert_torchvision_backbone(sd, "resnet50")

    bb = ResNetBackbone(name_or_depth="resnet50")
    x = jnp.zeros((1, 64, 128, 3), jnp.float32)
    init = jax.jit(bb.init)(jax.random.PRNGKey(0), x)

    merged = merge_params(
        {"params": {"backbone": init["params"]}},
        partial)["params"]["backbone"]

    # every converted leaf landed (shape-checked by merge_params), every
    # backbone leaf was covered, and values match the source weights
    flat_src = dict(jax.tree_util.tree_flatten_with_path(
        partial["params"]["backbone"])[0])
    flat_out = dict(jax.tree_util.tree_flatten_with_path(merged)[0])
    assert set(flat_src) == set(flat_out)
    for k in flat_src:
        np.testing.assert_array_equal(flat_src[k], flat_out[k])
    np.testing.assert_allclose(
        merged["conv1"]["kernel"],
        np.transpose(sd["conv1.weight"], (2, 3, 1, 0)))

    # unknown keys and shape mismatches are rejected
    with pytest.raises(KeyError):
        merge_params({"params": {"backbone": init["params"]}},
                     {"params": {"nonexistent": {"kernel": np.zeros(3)}}})
    bad = {"params": {"backbone": {"conv1": {"kernel": np.zeros((1, 1, 3, 64))}}}}
    with pytest.raises(ValueError):
        merge_params({"params": {"backbone": init["params"]}}, bad)
