"""Smooth-shaded z-buffer triangle rasterizer in pure jax.

Capability of the reference's pyrender offscreen mesh rendering
(``visualise/rendering.py:96-238``, ``voca/rendering.py:110``) without
pyrender/OpenGL/ffmpeg: SMPL-X vertices + faces -> lit frames, feeding
the same grid/GIF/AVI writers as the skeleton path (``viz/render.py``).
Shading matches the GL fixed-function look the reference gets from
pyrender's per-vertex-normal Phong pipeline: area-weighted vertex
normals, barycentric normal + depth interpolation per pixel, two-sided
Lambert diffuse + Blinn-Phong specular over an ambient floor.

TPU-first formulation: no sequential per-triangle scatter — the z-buffer
is a **min-reduction over triangles per pixel**. Pixels are processed in
row blocks and triangles in chunks under ``lax.scan``, so the whole frame
is one compiled program of dense (pixels x triangles) edge-function tests.
Winning-triangle attribute fetches are one-hot matmuls (MXU-friendly; a
minor-dim gather would serialize on TPU). Static shapes,
O(HW·F/chunks) memory.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _vertex_normals(verts, faces):
    """(V, 3) area-weighted vertex normals (the standard GL smooth-shading
    normals pyrender derives for SMPL-X meshes). Cross products are
    proportional to face area, so plain scatter-add area-weights."""
    tri = verts[faces]                                   # (F, 3, 3)
    fn = jnp.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    vn = (jnp.zeros_like(verts)
          .at[faces[:, 0]].add(fn)
          .at[faces[:, 1]].add(fn)
          .at[faces[:, 2]].add(fn))
    return vn / jnp.clip(jnp.linalg.norm(vn, axis=-1, keepdims=True), 1e-8)


def rotation_about(axis: str, radians: float) -> np.ndarray:
    """(3, 3) rotation about a principal axis."""
    c, s = np.cos(radians), np.sin(radians)
    if axis == "x":
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]], np.float32)
    if axis == "y":
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    if axis == "z":
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    raise ValueError(axis)


def view_rotation(rotation_times: int, axis: str = "x",
                  step_degrees: float = 45.0) -> np.ndarray:
    """The reference's discrete view change: the camera pose rotated
    ``rotation_times`` x 45 deg (voca/rendering.py rotate_camera_pose,
    used by ``_render_change_view``, visualise/rendering.py:143-238).
    Returns the equivalent (3, 3) WORLD rotation about the mesh center."""
    return rotation_about(axis, -np.deg2rad(step_degrees) * rotation_times)


def orbit_camera_path(n_frames: int, total_degrees: float = 360.0,
                      axis: str = "y") -> np.ndarray:
    """(T, 3, 3) camera path orbiting the subject across the clip —
    the continuous version of the reference's rotating-view render."""
    angles = np.deg2rad(np.linspace(0.0, total_degrees, n_frames,
                                    endpoint=False))
    return np.stack([rotation_about(axis, a) for a in angles])


def render_mesh(verts, faces, image_size: int = 512, scale: float = 1.8,
                center=None, color=(0.75, 0.72, 0.68),
                background=(0.06, 0.06, 0.08),
                light_dir=(0.3, 0.4, 0.85), row_block: int = 32,
                tri_chunk: int = 512, camera=None):
    """Rasterize one mesh -> (H, W, 3) float image in [0, 1].

    verts (V, 3) float (x right, y up, z toward viewer — orthographic);
    faces (F, 3) int32; camera: optional (3, 3) world rotation applied
    about the projection center (the orthographic equivalent of moving the
    camera). jit-compiled per (V, F, image_size) signature.
    """
    while image_size % row_block:       # row blocks must tile the image
        row_block //= 2
    return _render_jit(jnp.asarray(verts), jnp.asarray(faces, jnp.int32),
                       image_size, float(scale),
                       None if center is None else jnp.asarray(center),
                       jnp.asarray(color, jnp.float32),
                       jnp.asarray(background, jnp.float32),
                       jnp.asarray(light_dir, jnp.float32),
                       max(row_block, 1), tri_chunk,
                       None if camera is None
                       else jnp.asarray(camera, jnp.float32))


def _pad_faces(faces, chunk):
    f = faces.shape[0]
    pad = (-f) % chunk
    if pad:
        # degenerate (all-same-vertex) padding triangles never cover pixels
        faces = jnp.concatenate(
            [faces, jnp.zeros((pad, 3), faces.dtype)], axis=0)
    return faces


from functools import partial  # noqa: E402


@partial(jax.jit, static_argnums=(2, 8, 9))
def _render_jit(verts, faces, image_size, scale, center, color, background,
                light_dir, row_block, tri_chunk, camera=None):
    h = w = image_size
    if center is None:
        center = verts.mean(0)
    if camera is not None:
        # rotate the world about the projection center (orthographic
        # camera move — the reference's rotating-view capability)
        verts = (verts - center) @ camera.T + center
    # orthographic projection to pixel coords (y down)
    xy = (verts[:, :2] - center[:2]) * scale
    px = (xy[:, 0] * 0.5 + 0.5) * w
    py = (0.5 - xy[:, 1] * 0.5) * h
    pz = verts[:, 2] - center[2]                        # larger z = closer
    pts = jnp.stack([px, py], axis=-1)                  # (V, 2)

    vn = _vertex_normals(verts, faces)                  # (V, 3) smooth
    faces = _pad_faces(faces, tri_chunk)

    tri_xy = pts[faces]                                 # (F, 3, 2)
    tri_zs = pz[faces]                                  # (F, 3) vertex depth
    tri_vn = vn[faces]                                  # (F, 3, 3)
    n_chunks = faces.shape[0] // tri_chunk
    tri_xy = tri_xy.reshape(n_chunks, tri_chunk, 3, 2)
    tri_zs = tri_zs.reshape(n_chunks, tri_chunk, 3)
    tri_vn = tri_vn.reshape(n_chunks, tri_chunk, 3, 3)

    ys = jnp.arange(h, dtype=jnp.float32) + 0.5
    xs = jnp.arange(w, dtype=jnp.float32) + 0.5

    def render_rows(y0):
        yy = jax.lax.dynamic_slice_in_dim(ys, y0, row_block)
        gx = jnp.tile(xs[None, :], (row_block, 1)).reshape(-1)      # (P,)
        gy = jnp.repeat(yy, w)                                      # (P,)

        def tri_pass(carry, inp):
            zbuf, nbuf = carry
            txy, tzs, tvn = inp                 # (C,3,2) (C,3) (C,3,3)
            a, b, c = txy[:, 0], txy[:, 1], txy[:, 2]

            def edge(p0, p1):
                # (P, C) signed area of (p0->p1, p0->pixel)
                ex = p1[:, 0] - p0[:, 0]
                ey = p1[:, 1] - p0[:, 1]
                return (gx[:, None] - p0[None, :, 0]) * ey[None] - \
                       (gy[:, None] - p0[None, :, 1]) * ex[None]

            e0, e1, e2 = edge(a, b), edge(b, c), edge(c, a)
            inside = ((e0 >= 0) & (e1 >= 0) & (e2 >= 0)) | \
                     ((e0 <= 0) & (e1 <= 0) & (e2 <= 0))
            denom = e0 + e1 + e2                # (P, C) signed 2x area
            inside = inside & (jnp.abs(denom) > 1e-8)
            safe = jnp.where(jnp.abs(denom) > 1e-8, denom, 1.0)
            # barycentric weights: the edge function OPPOSITE each vertex
            wa, wb, wc = e1 / safe, e2 / safe, e0 / safe
            # per-pixel interpolated depth (GL-correct occlusion, vs the
            # old per-face flat depth)
            z = wa * tzs[None, :, 0] + wb * tzs[None, :, 1] \
                + wc * tzs[None, :, 2]
            z = jnp.where(inside, z, -jnp.inf)          # (P, C)
            zc = z.max(-1)
            best = jax.nn.one_hot(z.argmax(-1), z.shape[-1],
                                  dtype=z.dtype)        # (P, C)
            # winning triangle's interpolated normal via one-hot matmuls
            # (minor-dim gathers serialize on TPU; these ride the MXU)
            n_pix = ((best * wa) @ tvn[:, 0] + (best * wb) @ tvn[:, 1]
                     + (best * wc) @ tvn[:, 2])         # (P, 3)
            better = zc > zbuf
            return (jnp.where(better, zc, zbuf),
                    jnp.where(better[:, None], n_pix, nbuf)), None

        zbuf0 = jnp.full((row_block * w,), -jnp.inf)
        nbuf0 = jnp.zeros((row_block * w, 3))
        (zbuf, nbuf), _ = jax.lax.scan(tri_pass, (zbuf0, nbuf0),
                                       (tri_xy, tri_zs, tri_vn))
        covered = jnp.isfinite(zbuf)
        # two-sided Blinn-Phong: ambient + Lambert diffuse on the
        # interpolated unit normal, plus a specular lobe toward the
        # half-vector (orthographic view direction +z)
        n = nbuf / jnp.clip(jnp.linalg.norm(nbuf, axis=-1, keepdims=True),
                            1e-8)
        l = light_dir / jnp.clip(jnp.linalg.norm(light_dir), 1e-8)
        hv = l + jnp.asarray([0.0, 0.0, 1.0], l.dtype)
        hv = hv / jnp.clip(jnp.linalg.norm(hv), 1e-8)
        lam = jnp.clip(jnp.abs(n @ l), 0.0, 1.0)
        spec = jnp.clip(jnp.abs(n @ hv), 0.0, 1.0) ** 32.0
        rgb = (0.25 + 0.75 * lam)[:, None] * color[None] \
            + 0.25 * spec[:, None]
        rgb = jnp.where(covered[:, None], jnp.clip(rgb, 0.0, 1.0),
                        background[None])
        return rgb.reshape(row_block, w, 3)

    blocks = jax.lax.map(render_rows,
                         jnp.arange(0, h, row_block, dtype=jnp.int32))
    return blocks.reshape(h, w, 3)


def render_mesh_frames(vertices, faces, image_size: int = 512,
                       camera_path=None, **kw):
    """(T, V, 3) vertices -> list of PIL images (shared auto-center).

    camera_path: None | (3, 3) fixed view | (T, 3, 3) per-frame rotations
    (e.g. ``orbit_camera_path`` — the reference's ``_render_change_view``
    orbit, visualise/rendering.py:143-238)."""
    from PIL import Image

    vertices = np.asarray(vertices)
    center = vertices.reshape(-1, 3).mean(0)
    if camera_path is not None:
        camera_path = np.asarray(camera_path, np.float32)
        if camera_path.ndim == 2:
            camera_path = np.tile(camera_path[None],
                                  (vertices.shape[0], 1, 1))
    frames = []
    for t in range(vertices.shape[0]):
        cam = None if camera_path is None else camera_path[t]
        img = np.asarray(render_mesh(vertices[t], faces, image_size,
                                     center=center, camera=cam, **kw))
        frames.append(Image.fromarray(
            (np.clip(img, 0, 1) * 255).astype(np.uint8)))
    return frames
