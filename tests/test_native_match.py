"""Native C++ evaluator matching == numpy matcher == reference
transliteration, plus end-to-end AP equality native vs numpy."""

import numpy as np
import pytest

from monodetr_tpu import native
from monodetr_tpu.eval.kitti_eval.eval import (
    _match_image_np,
    get_official_eval_result,
)
from tests.test_kitti_eval import make_annos, random_case

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native lib not built"
)


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("compute_fp", [False, True])
def test_native_match_equals_numpy(seed, compute_fp):
    rng = np.random.RandomState(seed)
    overlaps, gt_datas, dt_datas, ig, idt, dc = random_case(rng, 14, 18)
    threshs = [0.0, 0.25, 0.5, 0.75] if compute_fp else [0.0]
    a = native.match_image(
        overlaps, dt_datas[:, -1], dt_datas[:, 4], gt_datas[:, 4],
        dt_datas[:, :4], ig, idt, dc, 0, 0.5,
        np.asarray(threshs, np.float64), compute_fp, True,
    )
    b = _match_image_np(
        overlaps, gt_datas, dt_datas, ig, idt, dc, metric=0,
        min_overlap=0.5, threshs=threshs, compute_fp=compute_fp,
        compute_aos=True,
    )
    np.testing.assert_array_equal(a[0], b[0])  # tp
    np.testing.assert_array_equal(a[2], b[2])  # fn
    if compute_fp:
        np.testing.assert_array_equal(a[1], b[1])  # fp
        np.testing.assert_allclose(a[3], b[3], rtol=1e-9)  # sim
    for t in range(len(threshs)):
        np.testing.assert_allclose(sorted(a[4][t]), sorted(b[4][t]))


def test_full_eval_native_equals_numpy(monkeypatch):
    rng = np.random.RandomState(0)
    gt, dt = make_annos(rng, n_imgs=25)
    for d in dt:
        d["location"] = d["location"] + rng.randn(*d["location"].shape) * 0.4
    _, ret_native, mod_native = get_official_eval_result(gt, dt, 0)

    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_LIB_PATH", "/nonexistent")
    assert not native.available()
    _, ret_np, mod_np = get_official_eval_result(gt, dt, 0)

    np.testing.assert_allclose(mod_native, mod_np, rtol=1e-9)
    for k in ret_np:
        np.testing.assert_allclose(ret_native[k], ret_np[k], rtol=1e-9, err_msg=k)
