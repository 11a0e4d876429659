import os

import numpy as np
import pytest

from nopesac_tpu.utils import rle as rle_util
from nopesac_tpu.utils.mesh import (
    backproject_plane_points, camera_frustum_mesh, join_meshes,
    plane_to_mesh, save_obj, save_ply, transform_mesh,
)
from nopesac_tpu.utils.np_geometry import plane_params_to_global
from nopesac_tpu.visualization.vis2d import create_instances, draw_match, get_labeled_seg


def default_kmap(h, w):
    from nopesac_tpu.core.geometry import get_coordinate_map

    return np.asarray(get_coordinate_map(h=h, w=w))


class TestBackprojection:
    def test_points_lie_on_plane(self):
        h, w = 48, 64
        kmap = default_kmap(h, w)
        plane = np.array([0.0, 0.0, 2.0])  # suncg param: normal +z, offset 2
        mask = np.zeros((h, w), bool)
        mask[20:30, 25:40] = True
        pts, ys, xs = backproject_plane_points(mask, plane, kmap)
        # habitat frame: flipped normal is (0, 0, -1), offset 2 -> n.X = 2
        flipped = plane * np.array([1, -1, -1])
        n = flipped / np.linalg.norm(flipped)
        d = np.linalg.norm(flipped)
        np.testing.assert_allclose(pts @ n, np.full(len(pts), d), atol=1e-5)

    def test_mesh_faces_valid(self):
        h, w = 48, 64
        kmap = default_kmap(h, w)
        mask = np.zeros((h, w), bool)
        mask[10:40, 10:50] = True
        m = plane_to_mesh(mask, np.array([0.5, 0.5, 1.0]), kmap, step=2)
        assert m is not None
        assert m["faces"].max() < len(m["verts"])
        assert len(m["faces"]) > 10

    def test_transform_roundtrip(self):
        mesh = {"verts": np.random.default_rng(0).normal(size=(10, 3)),
                "faces": np.zeros((0, 3), np.int64), "vert_colors": None}
        q = np.array([0.9, 0.1, 0.3, 0.2])
        q = q / np.linalg.norm(q)
        t = np.array([1.0, -2.0, 0.5])
        out = transform_mesh(mesh, t, q)
        # invert
        from nopesac_tpu.utils.np_geometry import quat_conjugate, quat_to_rotmat

        r_inv = quat_to_rotmat(quat_conjugate(q))
        back = (out["verts"] - t) @ r_inv.T
        np.testing.assert_allclose(back, mesh["verts"], atol=1e-10)


class TestWriters:
    def test_obj_and_ply(self, tmp_path):
        mesh = {
            "verts": np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], float),
            "faces": np.array([[0, 1, 2]]),
            "vert_colors": np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], float),
        }
        p = save_obj(str(tmp_path), "tri", mesh)
        content = open(p).read()
        assert content.count("\nv ") + content.startswith("v ") == 3
        assert "f 1 2 3" in content
        p2 = save_ply(str(tmp_path / "tri.ply"), mesh)
        ply = open(p2).read()
        assert "element vertex 3" in ply and "element face 1" in ply

    def test_join_and_frustum(self, tmp_path):
        f1 = camera_frustum_mesh([0, 0, 0], [1, 0, 0, 0])
        f2 = camera_frustum_mesh([1, 0, 0], [1, 0, 0, 0])
        joined = join_meshes([f1, f2])
        assert len(joined["verts"]) == 10
        assert joined["faces"].max() == 9


class TestVis2D:
    def test_labeled_seg_and_match(self, tmp_path):
        h, w = 60, 80
        img = np.full((h, w, 3), 128, np.uint8)
        m0 = np.zeros((h, w), np.uint8); m0[5:25, 5:30] = 1
        m1 = np.zeros((h, w), np.uint8); m1[30:50, 40:70] = 1
        seg = get_labeled_seg(img, [m0, m1])
        assert seg.shape == (h, w, 3)
        assert not np.array_equal(seg, img)

        out = draw_match(img, img, [m0, m1], [m1, m0], np.array([[0, 1], [1, 0]]))
        assert out.shape == (h, 2 * w, 3)

    def test_create_instances_filters(self):
        preds = [
            {"score": 0.9, "category_id": 0, "segmentation": {"size": [4, 4], "counts": b"04"}},
            {"score": 0.05, "category_id": 0, "segmentation": {"size": [4, 4], "counts": b"04"}},
        ]
        inst = create_instances(preds, (4, 4), pred_planes=np.eye(2, 3), conf_threshold=0.1)
        assert len(inst["scores"]) == 1
        assert inst["pred_planes"].shape == (1, 3)
