import numpy as np

from nopesac_tpu.core import metrics as M


class TestVocAp:
    def test_perfect_detector(self):
        scores = np.array([0.9, 0.8, 0.7])
        labels = np.array([1, 1, 1])
        assert abs(M.compute_ap(scores, labels, npos=3) - 1.0) < 1e-9

    def test_empty(self):
        assert M.compute_ap(np.array([]), np.array([]), npos=5) == 0.0

    def test_half(self):
        # one TP at rank1, one FP at rank2, npos=2 -> AP = 0.5 (prec 1.0 at rec 0.5, then 0)
        scores = np.array([0.9, 0.8])
        labels = np.array([1, 0])
        assert abs(M.compute_ap(scores, labels, npos=2) - 0.5) < 1e-9

    def test_interp_monotone(self):
        # precision envelope should be monotone non-increasing
        scores = np.array([0.9, 0.8, 0.7, 0.6])
        labels = np.array([0, 1, 0, 1])
        ap = M.compute_ap(scores, labels, npos=2)
        assert 0.0 < ap < 1.0
        # manual: rec=[0,.5,.5,1], prec=[0,.5,.33,.5] -> envelope [.5,.5,.5,.5] -> ap=.5
        assert abs(ap - 0.5) < 1e-9


class TestComparePlanes:
    def test_identical_planes(self):
        p = np.random.default_rng(0).normal(size=(4, 3))
        out = M.compare_planes(p, p)
        np.testing.assert_allclose(np.diag(out["norm"]), 0.0, atol=1e-3)
        np.testing.assert_allclose(np.diag(out["offset"]), 0.0, atol=1e-6)

    def test_known_angle(self):
        p1 = np.array([[1.0, 0, 0]])
        p2 = np.array([[0.0, 2.0, 0]])
        out = M.compare_planes(p1, p2)
        np.testing.assert_allclose(out["norm"][0, 0], 90.0, atol=1e-2)
        np.testing.assert_allclose(out["offset"][0, 0], 1.0, atol=1e-4)

    def test_one_to_one(self):
        p1 = np.array([[1.0, 0, 0], [0, 2.0, 0]])
        out = M.compare_planes_one_to_one(p1, p1)
        assert out["l2"] < 1e-6 and out["norm"] < 1e-3 and out["offset"] < 1e-6


class TestCameraErrors:
    def test_rotation_angle(self):
        ang = np.deg2rad(30.0)
        q1 = np.array([[1.0, 0, 0, 0]])
        q2 = np.array([[np.cos(ang / 2), np.sin(ang / 2), 0, 0]])
        np.testing.assert_allclose(M.rotation_angle_error_deg(q1, q2), [30.0], atol=1e-6)

    def test_summary_keys(self):
        s = M.camera_error_summary([0.1, 0.3, 1.5], [5.0, 20.0, 40.0])
        assert abs(s["T err < 1.0"] - 100.0 * 2 / 3) < 1e-9
        assert abs(s["R err < 30"] - 100.0 * 2 / 3) < 1e-9
        assert s["T median err"] == 0.3
