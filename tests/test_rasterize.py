"""Z-buffer mesh rasterizer tests (viz/rasterize.py).

Golden-checks core rasterization semantics: coverage, occlusion ordering,
background, and the end-to-end SMPL-X-fixture -> video path the reference
does with pyrender (visualise/rendering.py:96-238).
"""

import numpy as np
import pytest

from probtalk_tpu.viz.rasterize import (
    orbit_camera_path,
    render_mesh,
    render_mesh_frames,
    rotation_about,
    view_rotation,
)

SZ = 64
BG = (0.06, 0.06, 0.08)


def tri(z, shift=0.0):
    """A triangle covering the image center at depth z."""
    return np.asarray([[-0.3 + shift, -0.3, z], [0.3 + shift, -0.3, z],
                       [shift, 0.4, z]], np.float32)


class TestRasterizer:
    def test_coverage_and_background(self):
        verts = tri(0.0)
        img = np.asarray(render_mesh(verts, np.asarray([[0, 1, 2]]), SZ,
                                     center=np.zeros(3), tri_chunk=4,
                                     row_block=8))
        assert img.shape == (SZ, SZ, 3)
        # center covered, corner background
        assert not np.allclose(img[SZ // 2, SZ // 2], BG)
        np.testing.assert_allclose(img[1, 1], BG, atol=1e-6)

    def test_camera_rotation_moves_subject(self):
        """VERDICT r2 item 8: camera parameterization — a y-rotation must
        shift an off-center triangle across the image (the reference's
        _render_change_view capability, visualise/rendering.py:143-238)."""
        verts = tri(0.5, shift=0.4)
        faces = np.asarray([[0, 1, 2]])
        kw = dict(center=np.zeros(3), tri_chunk=4, row_block=8)
        base = np.asarray(render_mesh(verts, faces, SZ, **kw))
        quarter = np.asarray(render_mesh(verts, faces, SZ, **kw,
                                         camera=rotation_about("y", np.pi / 2)))
        half = np.asarray(render_mesh(verts, faces, SZ, **kw,
                                      camera=rotation_about("y", np.pi)))
        cov = lambda im: (~np.isclose(im, BG).all(-1))
        # 90 deg: the x-offset triangle rotates toward the z axis
        assert cov(base).any() and cov(half).any()
        xs_base = np.nonzero(cov(base).any(0))[0]
        xs_half = np.nonzero(cov(half).any(0))[0]
        # 180 deg about y mirrors x: coverage lands on the opposite side
        np.testing.assert_allclose(xs_half.mean(), SZ - xs_base.mean(),
                                   atol=2.0)
        assert not np.array_equal(cov(base), cov(quarter))

    def test_camera_path_helpers(self):
        path = orbit_camera_path(12, 360.0)
        assert path.shape == (12, 3, 3)
        np.testing.assert_allclose(
            np.linalg.det(path), np.ones(12), atol=1e-5)
        np.testing.assert_allclose(path[0], np.eye(3), atol=1e-6)
        # view_rotation(k) == k * 45deg steps
        np.testing.assert_allclose(
            view_rotation(2, "y"), rotation_about("y", -np.pi / 2), atol=1e-6)
        frames = render_mesh_frames(
            np.stack([tri(0.2, 0.3)] * 4), np.asarray([[0, 1, 2]]), 32,
            camera_path=orbit_camera_path(4, 360.0), tri_chunk=4, row_block=8)
        assert len(frames) == 4

    def test_occlusion_near_wins(self):
        # front triangle flat (z=1); back triangle tilted so its flat-shade
        # intensity differs — occlusion decides the center pixel
        front = tri(1.0)
        back = tri(-1.0)
        back[0, 2] += 1.5                        # tilt -> different normal
        faces2 = np.asarray([[0, 1, 2], [3, 4, 5]])
        kw = dict(center=np.zeros(3), tri_chunk=4, row_block=8)

        img_front_only = np.asarray(render_mesh(front, [[0, 1, 2]], SZ, **kw))
        img_back_only = np.asarray(render_mesh(back, [[0, 1, 2]], SZ, **kw))
        both = np.asarray(render_mesh(np.concatenate([front, back]), faces2,
                                      SZ, **kw))
        c = (SZ // 2, SZ // 2)
        # shades genuinely differ at the center
        assert not np.allclose(img_front_only[c], img_back_only[c])
        # with both present, the near (front) triangle wins the pixel
        np.testing.assert_allclose(both[c], img_front_only[c], atol=1e-6)

    def test_zbuffer_matches_numpy_reference(self, rng):
        """Random small mesh vs a naive per-pixel numpy rasterizer."""
        v = rng.normal(size=(12, 3)).astype(np.float32) * 0.4
        f = rng.integers(0, 12, (8, 3)).astype(np.int32)
        img = np.asarray(render_mesh(v, f, 32, center=np.zeros(3),
                                     color=(1, 1, 1), tri_chunk=4,
                                     row_block=8))

        # naive reference: same projection/edge-test math, python loops
        px = (v[:, 0] * 1.8 * 0.5 + 0.5) * 32
        py = (0.5 - v[:, 1] * 1.8 * 0.5) * 32
        cover = np.zeros((32, 32), bool)
        for yi in range(32):
            for xi in range(32):
                x, y = xi + 0.5, yi + 0.5
                for a, b, c in f:
                    e = []
                    for p0, p1 in ((a, b), (b, c), (c, a)):
                        e.append((x - px[p0]) * (py[p1] - py[p0]) -
                                 (y - py[p0]) * (px[p1] - px[p0]))
                    e = np.asarray(e)
                    area = abs((px[b] - px[a]) * (py[c] - py[a]) -
                               (py[b] - py[a]) * (px[c] - px[a]))
                    if area > 1e-8 and (np.all(e >= 0) or np.all(e <= 0)):
                        cover[yi, xi] = True
                        break
        got_cover = ~np.all(np.isclose(img, np.asarray(BG)), axis=-1)
        # allow edge-pixel disagreement on shared edges
        assert (got_cover == cover).mean() > 0.98

    def test_smooth_shading_continuous_across_shared_edge(self):
        """Two tent triangles sharing a ridge: their face normals differ
        by ~53 deg, so FLAT shading steps at the ridge; smooth (vertex-
        normal interpolated) shading must be near-continuous across it —
        the pyrender-look upgrade (visualise/rendering.py Phong path)."""
        verts = np.asarray([[0.0, -0.4, 0.3], [0.0, 0.4, 0.3],     # ridge
                            [-0.5, 0.0, -0.2], [0.5, 0.0, -0.2]],
                           np.float32)
        faces = np.asarray([[0, 1, 2], [0, 3, 1]], np.int32)
        img = np.asarray(render_mesh(verts, faces, SZ, center=np.zeros(3),
                                     color=(1, 1, 1), tri_chunk=4,
                                     row_block=8))
        mid = SZ // 2
        left, right = img[mid, mid - 2, 0], img[mid, mid + 1, 0]
        # flat normals: n_left ~ (-0.38, 0, 0.92), n_right ~ (0.38, 0, .92)
        # => flat Lambert with light (0.3, 0.4, 0.85) differs by ~0.17;
        # the interpolated shade must be an order of magnitude closer
        assert abs(float(left) - float(right)) < 0.05, (left, right)

    def test_interpolated_depth_crossing_occlusion(self):
        """Two triangles crossing in depth (left half A wins, right half
        B): per-PIXEL interpolated z must flip the winner mid-image —
        per-face flat depth picks a single winner everywhere."""
        big = 0.9
        a = np.asarray([[-big, -big, -0.5], [big, -big, 0.5],
                        [0.0, big, 0.0]], np.float32)     # z rises left->right
        b = np.asarray([[-big, -big, 0.5], [big, -big, -0.5],
                        [0.0, big, 0.0]], np.float32)     # z falls left->right
        verts = np.concatenate([a, b])
        faces = np.asarray([[0, 1, 2], [3, 4, 5]], np.int32)
        both = np.asarray(render_mesh(verts, faces, SZ, center=np.zeros(3),
                                      tri_chunk=4, row_block=8))
        only_a = np.asarray(render_mesh(a, [[0, 1, 2]], SZ,
                                        center=np.zeros(3), tri_chunk=4,
                                        row_block=8))
        only_b = np.asarray(render_mesh(b, [[0, 1, 2]], SZ,
                                        center=np.zeros(3), tri_chunk=4,
                                        row_block=8))
        y = SZ - SZ // 4                         # a low row crossing both
        xl, xr = SZ // 4, SZ - SZ // 4
        # left: B is closer (z=+0.5 side); right: A is closer
        np.testing.assert_allclose(both[y, xl], only_b[y, xl], atol=1e-5)
        np.testing.assert_allclose(both[y, xr], only_a[y, xr], atol=1e-5)
        assert not np.allclose(only_a[y, xl], only_b[y, xl])

    def test_vertex_normals_of_octahedron_point_outward(self):
        from probtalk_tpu.viz.rasterize import _vertex_normals
        import jax.numpy as jnp

        v = np.asarray([[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0],
                        [0, 0, 1], [0, 0, -1]], np.float32)
        f = np.asarray([[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
                        [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]],
                       np.int32)
        vn = np.asarray(_vertex_normals(jnp.asarray(v), jnp.asarray(f)))
        # a closed convex solid's area-weighted vertex normals point along
        # the vertex directions
        np.testing.assert_allclose(vn, v, atol=1e-5)

    def test_smplx_fixture_to_video(self, tmp_path, rng):
        from probtalk_tpu.smplx import (
            load_smplx, smplx_forward, write_synthetic_smplx_npz,
        )
        from probtalk_tpu.viz.render import RenderTool

        path = str(tmp_path / "synth.npz")
        write_synthetic_smplx_npz(path, n_verts=80, n_faces=120)
        import jax.numpy as jnp

        model = load_smplx(path)
        pose = 0.2 * rng.normal(size=(3, 165)).astype(np.float32)
        out = smplx_forward(model, jnp.zeros((300,)), jnp.zeros((3, 100)),
                            jnp.asarray(pose), return_verts=True)
        verts = np.asarray(out["vertices"])          # (3, V, 3)
        rt = RenderTool(str(tmp_path), image_size=48)
        video = rt.render_mesh_sequences([verts], np.asarray(model.faces),
                                         "mesh_demo")
        import os

        assert os.path.exists(video) and os.path.getsize(video) > 1000
