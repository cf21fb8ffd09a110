"""Motion visualization: skeleton rendering + video container writers.

Capability of the reference's render stack (``visualise/rendering.py:96-238``:
pyrender offscreen mesh rendering -> OpenCV writer -> ffmpeg mux;
``voca/rendering.py:110``). This environment has neither pyrender, OpenCV,
nor ffmpeg, so the renderer is self-contained:

  * skeleton line rendering of SMPL-X joints with PIL (grid layouts for
    1..18 sequences like the reference's RenderTool)
  * GIF export via PIL, and an MJPEG-in-AVI writer implemented directly
    (plays in standard players, no ffmpeg needed)

Mesh rendering (vertices + faces) reduces to the same pipeline once an
SMPLX model npz provides faces; `project_points` is shared.
"""

from __future__ import annotations

import struct
from io import BytesIO
from typing import List, Optional, Sequence, Tuple

import numpy as np

# SMPL-X kinematic chain (parent per joint, first 22 body joints + jaw/eyes
# + simplified 5-finger chains) for stick-figure drawing
_BODY_BONES = [
    (0, 1), (0, 2), (0, 3), (1, 4), (2, 5), (3, 6), (4, 7), (5, 8), (6, 9),
    (7, 10), (8, 11), (9, 12), (12, 15), (9, 13), (9, 14), (13, 16), (14, 17),
    (16, 18), (17, 19), (18, 20), (19, 21), (15, 22), (15, 23), (15, 24),
]


def project_points(joints: np.ndarray, image_size: int = 512,
                   scale: float = 1.8, center: Optional[np.ndarray] = None):
    """Orthographic projection of (..., J, 3) joints to pixel coords
    (x right, y down), auto-centered."""
    j = np.asarray(joints)
    if center is None:
        center = j.reshape(-1, 3).mean(0)
    xy = (j[..., :2] - center[:2]) * scale
    px = (xy[..., 0] * 0.5 + 0.5) * image_size
    py = (0.5 - xy[..., 1] * 0.5) * image_size
    return np.stack([px, py], axis=-1)


def render_skeleton_frames(joints: np.ndarray, image_size: int = 512,
                           bones: Optional[Sequence[Tuple[int, int]]] = None,
                           color=(40, 160, 255)) -> List:
    """(T, J, 3) joints -> list of PIL images with the skeleton drawn."""
    from PIL import Image, ImageDraw

    bones = bones if bones is not None else _BODY_BONES
    center = joints.reshape(-1, 3).mean(0)
    pts = project_points(joints, image_size, center=center)
    frames = []
    nj = joints.shape[1]
    for t in range(joints.shape[0]):
        img = Image.new("RGB", (image_size, image_size), (16, 16, 20))
        draw = ImageDraw.Draw(img)
        for a, b in bones:
            if a < nj and b < nj:
                draw.line([tuple(pts[t, a]), tuple(pts[t, b])], fill=color,
                          width=3)
        for ji in range(min(nj, 55)):
            x, y = pts[t, ji]
            draw.ellipse([x - 2, y - 2, x + 2, y + 2], fill=(255, 255, 255))
        frames.append(img)
    return frames


def grid_layout(frame_lists: List[List], cols: Optional[int] = None):
    """Tile N sequences into a grid per frame (reference RenderTool grid
    layouts for 1-18 videos, rendering.py:107-238)."""
    from PIL import Image

    n = len(frame_lists)
    if cols is None:
        cols = int(np.ceil(np.sqrt(n)))
    rows = int(np.ceil(n / cols))
    t = min(len(f) for f in frame_lists)
    w, h = frame_lists[0][0].size
    out = []
    for i in range(t):
        canvas = Image.new("RGB", (cols * w, rows * h), (0, 0, 0))
        for k, fl in enumerate(frame_lists):
            canvas.paste(fl[i], ((k % cols) * w, (k // cols) * h))
        out.append(canvas)
    return out


def save_gif(frames: List, path: str, fps: float = 30.0):
    frames[0].save(path, save_all=True, append_images=frames[1:],
                   duration=int(1000 / fps), loop=0)


def save_mjpeg_avi(frames: List, path: str, fps: float = 30.0,
                   quality: int = 85, audio: Optional[np.ndarray] = None,
                   audio_sr: int = 16000):
    """Write an MJPEG AVI (RIFF) — self-contained, no ffmpeg.

    ``audio``: optional mono waveform (float in [-1,1] or int16) muxed as
    an interleaved 16-bit PCM ``auds`` stream — the capability of the
    reference's ffmpeg audio-mux step (visualise/rendering.py:213-238)
    without the subprocess. Standard players (vlc/mpv/ffmpeg) decode it.
    """
    w, h = frames[0].size
    jpegs = []
    for f in frames:
        buf = BytesIO()
        f.convert("RGB").save(buf, "JPEG", quality=quality)
        data = buf.getvalue()
        if len(data) % 2:
            data += b"\x00"
        jpegs.append(data)

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) % 2 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    n = len(jpegs)
    fps_i = max(int(round(fps)), 1)

    pcm = None
    if audio is not None:
        a = np.asarray(audio)
        if a.dtype != np.int16:   # float waveform -> 16-bit PCM
            a = np.clip(np.asarray(a, np.float64), -1.0, 1.0)
            a = (a * 32767.0).astype(np.int16)
        pcm = a.reshape(-1)

    n_streams = 1 if pcm is None else 2
    # stream + main headers
    avih = struct.pack("<14I", int(1e6 / fps_i), 0, 0, 0x10, n, 0,
                       n_streams, 0, w, h, 0, 0, 0, 0)
    strh = b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIII4H",
                                           0, 0, 0, 0, 1, fps_i, 0, n, 0, 0,
                                           0, 0, 0, w, h)
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    strl = chunk(b"LIST", b"strl" + chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl_body = b"hdrl" + chunk(b"avih", avih) + strl

    # interleave: per video frame, one '00dc' then that frame's '01wb' span
    spans = []
    if pcm is not None:
        block_align, byte_rate = 2, audio_sr * 2
        strh_a = b"auds" + b"\x00\x00\x00\x00" + struct.pack(
            "<IHHIIIIIIII4H", 0, 0, 0, 0, block_align, byte_rate, 0,
            len(pcm), 0, block_align, 0, 0, 0, 0, 0)
        strf_a = struct.pack("<HHIIHH", 1, 1, audio_sr, byte_rate,
                             block_align, 16)   # WAVEFORMATEX, PCM mono
        hdrl_body += chunk(b"LIST", b"strl" + chunk(b"strh", strh_a)
                           + chunk(b"strf", strf_a))
        edges = np.linspace(0, len(pcm), n + 1).astype(np.int64)
        spans = [pcm[edges[i]: edges[i + 1]].tobytes() for i in range(n)]
    hdrl = chunk(b"LIST", hdrl_body)

    movi_items, idx, offset = b"", b"", 4
    for i, j in enumerate(jpegs):
        movi_items += chunk(b"00dc", j)
        idx += b"00dc" + struct.pack("<III", 0x10, offset, len(j))
        offset += 8 + len(j) + (len(j) % 2)
        if spans and spans[i]:
            movi_items += chunk(b"01wb", spans[i])
            idx += b"01wb" + struct.pack("<III", 0x10, offset, len(spans[i]))
            offset += 8 + len(spans[i]) + (len(spans[i]) % 2)
    movi = chunk(b"LIST", b"movi" + movi_items)
    idx1 = chunk(b"idx1", idx)

    riff = b"AVI " + hdrl + movi + idx1
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(riff)) + riff)


class RenderTool:
    """Sequence-to-video surface mirroring visualise/rendering.py RenderTool."""

    def __init__(self, out_dir: str, image_size: int = 512, fps: float = 30.0):
        import os

        self.out_dir = out_dir
        self.image_size = image_size
        self.fps = fps
        os.makedirs(out_dir, exist_ok=True)

    def _write(self, frames, name: str, fmt: str, audio=None,
               audio_sr: int = 16000):
        import os

        path = os.path.join(self.out_dir, f"{name}.{fmt}")
        if fmt == "gif":
            save_gif(frames, path, self.fps)
        else:
            save_mjpeg_avi(frames, path, self.fps, audio=audio,
                           audio_sr=audio_sr)
        return path

    def render_sequences(self, joints_list: List[np.ndarray], name: str,
                         fmt: str = "avi", audio=None, audio_sr: int = 16000):
        """joints_list: N x (T, J, 3) -> one tiled video file. Returns path.
        ``audio``: the speech waveform, muxed into the AVI (the reference
        ships it via ffmpeg, visualise/rendering.py:213-238)."""
        frame_lists = [render_skeleton_frames(j, self.image_size)
                       for j in joints_list]
        frames = grid_layout(frame_lists) if len(frame_lists) > 1 else frame_lists[0]
        return self._write(frames, name, fmt, audio, audio_sr)

    def render_mesh_sequences(self, vertices_list: List[np.ndarray], faces,
                              name: str, fmt: str = "avi", audio=None,
                              audio_sr: int = 16000, camera_path=None):
        """vertices_list: N x (T, V, 3) SMPL-X vertices -> tiled mesh video
        (the reference's RenderTool._render_sequences path,
        visualise/rendering.py:107-238, via viz/rasterize.py).
        ``camera_path``: optional (T, 3, 3) or (3, 3) world rotations
        applied per frame (the reference's rotating-view variant,
        ``_render_change_view``, rendering.py:143-238)."""
        from probtalk_tpu.viz.rasterize import render_mesh_frames

        frame_lists = [render_mesh_frames(v, faces, self.image_size,
                                          camera_path=camera_path)
                       for v in vertices_list]
        frames = grid_layout(frame_lists) if len(frame_lists) > 1 else frame_lists[0]
        return self._write(frames, name, fmt, audio, audio_sr)
