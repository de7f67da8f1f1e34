"""Full-model forward goldens for the decoder VARIANTS vs the real
reference MonoDETR: use_dab, two_stage, two_stage_dino.

Same harness as test_golden_model.py (runnable reference on CPU via
tests/ref_import.py + weight transfer via tools/convert_checkpoint.py),
applied to each config-off variant so their query-generation paths
(DAB refpoint/tgt tables; two-stage proposal scoring + pos_trans; DINO
encoder-proposal heads + tgt table) are pinned against the reference's
own code rather than hand-derived re-statements.

Reference entry points: monodetr.py:69-76 (query params), :123-133 (head
clones), depthaware_transformer.py:108-118 (variant modules), :234-281
(two_stage/dab/dino decoder prep).
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tools")

import ref_import

ref_import.install()
ref_import.patch_msda_to_pytorch_core()

import torch  # noqa: E402

from convert_checkpoint import convert_state_dict  # noqa: E402

from test_golden_model import REF_CFG, _inputs  # noqa: E402

VARIANT_FLAGS = {
    "use_dab": {"use_dab": True},
    "two_stage": {"two_stage": True},
    # two_stage_dino intentionally absent: the reference's own forward
    # CRASHES under that flag (see test_reference_dino_is_broken below),
    # so no end-to-end golden can exist for it.
}


def _build_ref(cfg):
    from lib.models.monodetr.backbone import build_backbone
    from lib.models.monodetr.depth_predictor import DepthPredictor
    from lib.models.monodetr.depthaware_transformer import (
        build_depthaware_transformer,
    )
    from lib.models.monodetr.monodetr import MonoDETR as RefMonoDETR

    return RefMonoDETR(
        build_backbone(cfg),
        build_depthaware_transformer(cfg),
        DepthPredictor(cfg),
        num_classes=cfg["num_classes"],
        num_queries=cfg["num_queries"],
        aux_loss=cfg["aux_loss"],
        num_feature_levels=cfg["num_feature_levels"],
        with_box_refine=cfg["with_box_refine"],
        two_stage=cfg["two_stage"],
        init_box=cfg["init_box"],
        use_dab=cfg["use_dab"],
        two_stage_dino=cfg["two_stage_dino"],
    )


@pytest.mark.slow
@pytest.mark.parametrize("variant", sorted(VARIANT_FLAGS))
def test_variant_eval_forward_matches_reference(variant):
    import jax

    from monodetr_tpu.models import build_monodetr

    cfg = {**REF_CFG, **VARIANT_FLAGS[variant]}
    torch.manual_seed(5)
    ref = _build_ref(cfg)
    ref.eval()

    rng = np.random.RandomState(5)
    images, calibs, img_sizes = _inputs(rng)
    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(images).permute(0, 3, 1, 2).contiguous(),
            torch.from_numpy(calibs), None, torch.from_numpy(img_sizes),
            dn_args=0,
        )

    sd = {k: v.numpy() for k, v in ref.state_dict().items()
          if "num_batches_tracked" not in k}
    params = convert_state_dict(
        sd,
        two_stage=cfg["two_stage"],
        use_dab=cfg["use_dab"],
        two_stage_dino=cfg["two_stage_dino"],
    )

    model = build_monodetr({**cfg, "msda_impl": "gather",
                            "dec_msda_impl": "gather"})
    out = jax.jit(
        lambda p, i, c, s: model.apply(p, i, c, s, train=False)
    )(params, images, calibs, img_sizes)

    def cmp(name, a, b, atol):
        a = np.asarray(a)
        b = b.numpy()
        assert a.shape == b.shape, (name, a.shape, b.shape)
        np.testing.assert_allclose(a, b, atol=atol, rtol=1e-3, err_msg=name)

    cmp("pred_logits", out["pred_logits"], ref_out["pred_logits"], 2e-3)
    cmp("pred_boxes", out["pred_boxes"], ref_out["pred_boxes"], 2e-3)
    cmp("pred_3d_dim", out["pred_3d_dim"], ref_out["pred_3d_dim"], 2e-3)
    cmp("pred_depth", out["pred_depth"], ref_out["pred_depth"], 5e-3)
    cmp("pred_angle", out["pred_angle"], ref_out["pred_angle"], 2e-3)
    cmp("pred_depth_map_logits",
        np.transpose(np.asarray(out["pred_depth_map_logits"]), (0, 3, 1, 2)),
        ref_out["pred_depth_map_logits"], 2e-3)
    assert len(out["aux_outputs"]) == len(ref_out["aux_outputs"])
    for i, (o, r) in enumerate(zip(out["aux_outputs"],
                                   ref_out["aux_outputs"])):
        for k in ("pred_logits", "pred_boxes", "pred_3d_dim", "pred_depth",
                  "pred_angle"):
            cmp(f"aux[{i}].{k}", o[k], r[k], 5e-3)
    if variant == "two_stage":
        cmp("enc.pred_logits", out["enc_outputs"]["pred_logits"],
            ref_out["enc_outputs"]["pred_logits"], 5e-3)
        cmp("enc.pred_boxes", out["enc_outputs"]["pred_boxes"],
            ref_out["enc_outputs"]["pred_boxes"], 5e-3)


@pytest.mark.slow
def test_reference_dino_is_broken():
    """The reference's two_stage_dino variant cannot run AT ALL: its decoder
    expects (bs, nq, C) but the dino prep hands it (nq, bs, C) — the needed
    transpose is literally commented out in the reference source
    (depthaware_transformer.py:302 `query_embed ... #,INFo` / the decoder
    call's `#.transpose(1,0), for DINO`), so nn.MultiheadAttention inside
    cross_attn_depth raises a shape error in BOTH train and eval.

    This test pins that fact: it is the documented reason there is no
    end-to-end dino golden (our dino path instead follows the reference's
    evident intent and is covered by tests/test_model_variants.py).  If a
    fixed reference ever makes this pass, add the golden.
    """
    cfg = {**REF_CFG, "two_stage_dino": True}
    torch.manual_seed(5)
    ref = _build_ref(cfg)
    rng = np.random.RandomState(5)
    images, calibs, img_sizes = _inputs(rng)
    args = (
        torch.from_numpy(images).permute(0, 3, 1, 2).contiguous(),
        torch.from_numpy(calibs), None, torch.from_numpy(img_sizes),
    )
    for mode in ("train", "eval"):
        getattr(ref, mode)()
        with torch.no_grad(), pytest.raises(RuntimeError, match="shape"):
            ref(*args, dn_args=0)
