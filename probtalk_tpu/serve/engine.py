"""Session-based streaming serving engine with cross-session micro-batching.

The reference serves inference only as one-shot scripts over whole files
(``scripts/demo.py:69-181``, ``scripts/test_holisticbody.py:240-261``).
This module is the production counterpart for TPU deployment: many
concurrent audio streams share ONE compiled window program, batched
together whenever they have a window of input ready.

TPU-first design points:

- **One compiled step per batch bucket.** The window program (optional
  Wav2Vec2 frontend -> predictor MaskGit sample -> PQ decode -> refiner)
  is jitted once per power-of-two batch size; sessions are padded into the
  nearest bucket, so arbitrary concurrency never triggers a recompile.
- **Per-sample RNG via vmap.** The step is ``jax.vmap`` of a batch-1
  window with its own PRNG key per lane. JAX's counter-based PRNG makes a
  vmapped draw bitwise-equal to the same draw made alone, so within a
  bucket size a session's output is bitwise-independent of which other
  sessions (or pad rows) were batched with it — each session is exactly
  reproducible from its seed, and follows the offline
  ``streaming.make_streaming_generate`` schedule (same window grid, same
  key-split pattern). Across DIFFERENT bucket sizes the XLA programs
  differ, so on TPU outputs agree only to bf16 matmul tolerance
  (measured 5e-3 max abs on real-size stages; exact in f32 on CPU).
- **Raw-audio ingestion** (``frontend=(w2v_model, w2v_vars)``): sessions
  feed 16 kHz PCM and the engine runs the Wav2Vec2 (50->30 fps) encoder
  on device inside the SAME batched window program — clients never
  compute features, and the host->device upload shrinks from a 768-d
  feature window (~553 KB) to the waveform (~320 KB f32 / 160 KB int16
  with ``wav_dtype=np.int16``). Streaming deviation from the offline
  path (which encodes the WHOLE clip before windowing,
  ``scripts/demo.py:77-111``): acoustic attention context is local to
  each 180-frame window — the causal choice any streaming system must
  make; every emitted frame still has >=overlap frames of left context.
- **Transfer-aware batching** (this backend moves ~25 MB/s host<->device):
  the motion-context upload is the (overlap, C) tail only — the window
  gets zero-padded and masked INSIDE the program; the device call returns
  ``(refined, tails, key_data)`` and only the tiny tails + carried RNG key
  data are fetched at pump time
  (doubling as the completion barrier), while the full refined windows
  stay device-resident and transfer lazily at ``poll``/``feed``-return
  time, overlapping later batches' compute. ``emit_dtype=jnp.float16``
  additionally halves the output transfer (upcast to f32 on host).
- **Device-resident lane state** (``resident=True``): per-session carry
  (the (overlap, C) context tail + PRNG key data + the overlap's INPUT
  audio) lives in device lane-slot buffers, gather/scatter-updated
  inside the compiled step (donated, so XLA updates them in place). The
  pump then fetches ONE 4-byte probe per batch as the completion
  barrier instead of round-tripping every lane's tail through the host
  (~5.8 MB D2H+H2D per 64-lane batch over the tunnel), and
  continuation windows upload only their new ``step`` units — the
  window is rebuilt in-program from the device audio tail, so each
  input sample crosses the link exactly once (another ~2.1 MB per
  64-lane raw batch; upload is the dominant serving leg) — and emit
  only ``step`` frames (the overlap's motion, already delivered by the
  previous window, is trimmed ON DEVICE before the D2H transfer). First
  and continuation windows are therefore separate compiled programs and
  the pump partitions ready lanes by first-ness (steady state is
  all-continuation). Sessions hold a slot for their lifetime
  (``resident_slots`` bounds concurrency); slot recycling is safe
  because a fresh session's first window reads no carried state.
  Single-chip only — mesh serving keeps the host-carried path (arbitrary
  slot gather/scatter across the data axis would need collectives).
- **Static shapes everywhere.** Windows are fixed ``window`` frames
  (``window*sr/fps`` samples in raw mode); flush pads the tail edge-mode
  exactly like ``streaming.pad_to_windows`` and truncates the emitted
  frames to the true input length.
- **Scale-out over a device mesh.** Pass ``mesh`` (``parallel.mesh``)
  and the window batch shards across the mesh's ``data`` axis — sessions
  are independent, so serving scales like sample-parallel inference:
  variables replicate once, each chip runs ``bucket / n_data`` lanes,
  XLA SPMD inserts no cross-lane collectives. Buckets round up to a
  multiple of the data axis so every device holds equal rows.

Concurrency model: ``feed``/``poll``/``flush`` are thread-safe. ``feed``
by default runs the batching pump inline (single-tenant, lowest latency);
a server passes ``pump=False`` and drives ``pump_all()`` from one pump
thread so concurrent sessions land in the same device batch.
"""

from __future__ import annotations

import collections
import itertools
import threading
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from probtalk_tpu.utils.interp import resize_time


class SessionClosed(KeyError):
    """Raised when feeding/flushing an unknown or already-flushed session."""


class EngineBusy(RuntimeError):
    """Raised by create_session when max_sessions are already active."""


class _BatchOut:
    """One device call's refined windows, fetched to host at most once.

    Sessions batched together share one record; ``host()`` carries its own
    lock because co-batched sessions materialize from different handler
    threads (flush() runs outside the engine lock)."""

    __slots__ = ("dev", "np", "t", "_lock")

    def __init__(self, dev):
        self.dev = dev
        self.np = None
        self.t = int(dev.shape[1])
        self._lock = threading.Lock()

    def host(self) -> np.ndarray:
        with self._lock:
            if self.np is None:
                arr = np.asarray(self.dev)
                if arr.dtype != np.float32:
                    arr = arr.astype(np.float32)
                self.np = arr
                self.dev = None
            return self.np


@dataclass
class _Session:
    speaker: int
    # PRNG state as HOST key data (uint32 rows): the split chain runs
    # inside the compiled window step (wrap -> split -> key_data), so the
    # hot path issues zero eager per-session device ops while staying
    # bitwise-identical to the offline generator's host-side split chain
    key_data: np.ndarray = None
    feats: List[np.ndarray] = field(default_factory=list)
    n_feat: int = 0                          # true (unpadded) input units fed
    trimmed: int = 0                         # input units dropped from front
    last_active: float = 0.0                 # monotonic time of last feed/poll
    ready_since: Optional[float] = None      # when the next window got ready
    windows_done: int = 0
    ctx_tail: Optional[np.ndarray] = None    # (overlap, C) trailing context
    emitted: int = 0                         # motion frames produced so far
    # pending output: (batch record, lane, frames to skip at the front)
    pending: List[Tuple[_BatchOut, int, int]] = field(default_factory=list)
    new_frames: threading.Event = field(default_factory=threading.Event)
    waiters: int = 0                         # threads blocked in poll(timeout)
    closed: bool = False
    slot: Optional[int] = None               # resident-mode device lane slot

    def buffered(self) -> np.ndarray:
        """Un-consumed input units (absolute unit ``trimmed + i`` lives at
        row ``i``): windows already run are dropped eagerly, so a long
        stream holds only the current window tail, not its full history."""
        if len(self.feats) > 1:
            self.feats = [np.concatenate(self.feats, axis=0)]
        return self.feats[0] if self.feats else np.zeros((0, 0), np.float32)


class ServingEngine:
    """Micro-batching streaming engine over the three frozen stages.

    Constructor parameters mirror ``streaming.make_streaming_generate``;
    inputs are motion-fps audio features (T, aud_dim) — or, with
    ``frontend=(w2v_model, w2v_variables)``, raw 16 kHz PCM waveforms —
    fed incrementally per session. ``postprocess`` (optional) maps each
    emitted (T, C) normalized-fbhe chunk before it is returned (e.g.
    denormalize + part2full).
    """

    def __init__(self, vq_model, vq_variables, pred_stage, pred_state,
                 ref_stage, ref_state, window: int = 180, overlap: int = 30,
                 max_batch: int = 8, max_sessions: Optional[int] = None,
                 mesh=None,
                 postprocess: Optional[Callable[[np.ndarray], np.ndarray]] = None,
                 frontend: Optional[tuple] = None, sr: int = 16000,
                 fps: int = 30, wav_dtype=np.float32, emit_dtype=None,
                 idle_ttl: Optional[float] = None,
                 face: Optional[tuple] = None,
                 resident: bool = False, resident_slots: int = 256):
        self.window = window
        self.overlap = overlap
        self.step = window - overlap
        self.max_batch = max_batch
        self.max_sessions = max_sessions
        self.mesh = mesh
        self._granule = 1 if mesh is None else mesh.shape["data"]
        if max_batch % self._granule:
            raise ValueError(f"max_batch={max_batch} must be a multiple of "
                             f"the mesh data axis ({self._granule})")
        self.postprocess = postprocess
        self.mot_dim = pred_stage.mot_dim
        self.aud_dim = pred_stage.aud_dim
        self.raw_audio = frontend is not None
        self.wav_dtype = np.dtype(wav_dtype)
        if self.raw_audio:
            if (window * sr) % fps or (self.step * sr) % fps:
                raise ValueError(
                    f"window/step frames must map to whole samples: "
                    f"window={window} step={self.step} sr={sr} fps={fps}")
            if self.wav_dtype not in (np.float32, np.int16):
                raise ValueError("wav_dtype must be float32 or int16")
            self._upf = sr // np.gcd(sr, fps)      # units per frame (ratio)
            self._fpu = fps // np.gcd(sr, fps)
        else:
            self._upf = self._fpu = 1
        self.sr, self.fps = sr, fps
        self.emit_dtype = emit_dtype
        # abandoned-session GC: a client that stops feeding without flush
        # would otherwise hold its buffers (and a max_sessions slot) forever.
        # idle_ttl<=0 means disabled (same as None) — 0 must never mean
        # "expire everything on the next pump"
        self.idle_ttl = idle_ttl if (idle_ttl and idle_ttl > 0) else None
        # optional face stage (``face=(face_model, face_variables)``): the
        # dedicated jaw+expression generator joins the SAME batched window
        # program and its output splices over the body stages' face channels
        # on the emit side (the ai1.py composition, reference ai1.py:61-77).
        # Body-path context feedback stays unspliced so the body schedule is
        # bitwise-identical with or without the face stage. Streaming
        # deviation from the whole-clip ai1 splice: each window's face convs
        # see only that window's audio, so frames near a window edge lack
        # cross-window context (bounded by the face stack's receptive
        # field, well inside the `overlap` margin).
        self.face = face
        self._variables = (
            {"params": pred_state.params, **pred_state.mutables},
            {"params": ref_state.params, **ref_state.mutables},
            vq_variables,
            frontend[1] if self.raw_audio else (),
            face[1] if face is not None else (),
        )
        if mesh is not None:
            from probtalk_tpu.parallel.mesh import replicate

            self._variables = replicate(self._variables, mesh)
        # resident mode: per-session context tail + RNG key data live in
        # DEVICE lane-slot buffers, gather/scatter-updated inside the
        # compiled step. The non-resident pump round-trips (overlap, C)
        # tails through the host every batch (~2.9 MB D2H + re-upload at
        # 64 lanes over the ~25 MB/s tunnel) purely to rebuild context;
        # resident mode fetches only an 8-byte completion probe. A slot
        # is held for a session's lifetime, so resident_slots bounds the
        # concurrent sessions (create_session raises EngineBusy beyond
        # it). Mesh sharding keeps the host path: arbitrary slot
        # gather/scatter across the data axis would need collectives.
        self.resident = bool(resident)
        if self.resident and mesh is not None:
            raise ValueError("resident mode is single-chip (mesh=None); "
                             "mesh serving keeps host-carried context")
        self.resident_slots = int(resident_slots)
        self._free_slots = list(range(self.resident_slots))
        # lazy device state (tails_buf, kd_buf, aud_tail_buf)
        self._state_bufs = None
        one = self._build_one(
            vq_model, pred_stage, ref_stage,
            frontend[0] if self.raw_audio else None,
            face[0] if face is not None else None)
        self._step_fn = jax.jit(jax.vmap(one, in_axes=(None, 0, 0, 0, 0, 0, 0)))
        ov_units = self._units(self.overlap)

        def run_and_scatter(variables, bufs, slots, kds, aud, first,
                            n_valid, speaker):
            tails_buf, kd_buf, audt_buf = bufs
            tails = tails_buf[slots]
            emit, new_tails, new_kd = jax.vmap(
                one, in_axes=(None, 0, 0, 0, 0, 0, 0))(
                    variables, kds, aud, tails, first, n_valid, speaker)
            # pad rows all scatter to the reserved scratch slot (index
            # resident_slots); duplicate indices are fine — the scratch
            # row is never read as carried state
            tails_buf = tails_buf.at[slots].set(new_tails)
            kd_buf = kd_buf.at[slots].set(new_kd)
            # audio tail: the window's last `overlap` worth of input units
            # stays on device so the NEXT (continuation) window uploads
            # only its new `step` units — each sample crosses the link
            # exactly once (upload is the dominant serving leg)
            audt_buf = audt_buf.at[slots].set(aud[:, -ov_units:])
            # tiny completion probe: the pump fetches this one scalar as
            # the batch barrier (jax.block_until_ready returns at enqueue
            # on the tunnel backend) — bandwidth-free backpressure
            probe = jnp.bitwise_xor(new_kd[:, 0].sum(), new_kd[:, 1].sum())
            return emit, (tails_buf, kd_buf, audt_buf), probe

        def step_res_first(variables, tails_buf, kd_buf, audt_buf, slots,
                           kd_init, aud, n_valid, speaker):
            # FIRST-window lanes: seed key data comes from the host and
            # the full window's audio is uploaded; no carried state is
            # read (the slot may hold a previous tenant's stale state —
            # first=1 also zeroes the context tail inside `one`)
            first = jnp.ones((aud.shape[0],), jnp.float32)
            return run_and_scatter(
                variables, (tails_buf, kd_buf, audt_buf), slots, kd_init,
                aud, first, n_valid, speaker)

        def step_res_cont(variables, tails_buf, kd_buf, audt_buf, slots,
                          aud_new, n_valid, speaker):
            # continuation windows: key, context tail AND the overlap's
            # audio all live on device — the upload is only the new
            # `step` units; the window is rebuilt in-program
            aud = jnp.concatenate([audt_buf[slots], aud_new], axis=1)
            first = jnp.zeros((aud.shape[0],), jnp.float32)
            emit, bufs, probe = run_and_scatter(
                variables, (tails_buf, kd_buf, audt_buf), slots,
                kd_buf[slots], aud, first, n_valid, speaker)
            # a continuation window's first `overlap` frames are never
            # delivered (the previous window already emitted them): trim
            # ON DEVICE so the D2H output transfer is `step` frames too
            return emit[:, self.overlap:], bufs, probe

        # donate the state buffers: XLA aliases them in place per call
        self._step_res_first = jax.jit(step_res_first,
                                       donate_argnums=(1, 2, 3))
        self._step_res_cont = jax.jit(step_res_cont,
                                      donate_argnums=(1, 2, 3))
        self._sessions: Dict[str, _Session] = {}
        self._ids = itertools.count()
        self._lock = threading.Lock()
        # every key is seeded here: /healthz json.dumps() reads this dict
        # from a handler thread without the engine lock, so the pump thread
        # must never INSERT keys at runtime (dict-changed-size race)
        self.stats = {"windows": 0, "batches": 0, "pad_rows": 0, "expired": 0}
        # last-512 reservoirs: device wall ms per batched window call, and
        # window-ready -> output-emitted queueing latency ms
        self._batch_ms = collections.deque(maxlen=512)
        self._queue_ms = collections.deque(maxlen=512)

    # ------------------------------------------------------------------
    def _frames_of(self, units: int) -> int:
        """True input units (samples in raw mode, frames otherwise) ->
        whole motion frames covered."""
        return units * self._fpu // self._upf

    def _units(self, frames: int) -> int:
        return frames * self._upf // self._fpu

    # ------------------------------------------------------------------
    def _build_one(self, vq_model, pred_stage, ref_stage, fe_model,
                   face_model=None):
        """The batch-1 window program; vmapped (and in resident mode
        wrapped in slot gather/scatter) by the constructor."""
        window, ov = self.window, self.overlap
        int16_in = self.raw_audio and self.wav_dtype == np.int16
        emit_dtype = self.emit_dtype

        def one(variables, kd, aud_w, tail, first, n_valid, speaker):
            # batch-1 window; vmapped below so every lane owns its key.
            # The key arrives as raw uint32 key data and the offline
            # schedule's split (carry first output, consume second —
            # streaming.py:55,69) happens HERE, inside the compiled
            # program: no eager per-session split on the pump hot path,
            # same bit-exact chain.
            pred_vars, ref_vars, vq_vars, fe_vars, face_vars = variables
            carry, key = jax.random.split(jax.random.wrap_key_data(kd))
            if fe_model is not None:
                wav = aud_w.astype(jnp.float32)
                if int16_in:
                    wav = wav / 32768.0
                aud_w = fe_model.apply(fe_vars, wav[None], n_frames=window)[0]
                # flush-padded tail windows: repeat the last VALID feature
                # frame (edge mode) — the offline pad_to_windows semantics,
                # in feature space where it belongs (padding raw samples
                # and encoding them would leak pad values into the frames)
                idx = jnp.minimum(jnp.arange(window), n_valid - 1)
                aud_w = aud_w[idx]
            # motion context window rebuilt on device from the tail upload:
            # rows [0, ov) = previous window's tail (fresh sessions zeroed),
            # rest zero — identical to the old full-window host build
            live = 1.0 - first
            ctx = jnp.pad(tail, ((0, window - ov), (0, 0))) * live
            mask = jnp.pad(jnp.ones((ov, 1), jnp.float32),
                           ((0, window - ov), (0, 0))) * live
            aud_w, ctx, mask = aud_w[None], ctx[None], mask[None]
            speaker = speaker[None]
            masked = ctx * mask
            codes = pred_stage.apply(pred_vars, key, masked, mask, speaker,
                                     aud_w, method=pred_stage.sample)
            prelim = vq_model.apply(vq_vars, codes, train=False,
                                    method=vq_model.decode_codes)
            prelim = resize_time(prelim, window)
            blended = masked * mask + prelim * (1.0 - mask)
            refined = ref_stage.apply(ref_vars, blended, aud_w, mask, speaker,
                                      train=False)
            out = (ctx * mask + refined * (1.0 - mask))[0]
            emit = out
            if face_model is not None:
                # splice the face generator's jaw+expression over the body
                # output ON THE EMIT SIDE ONLY (pipeline.splice_face /
                # ai1.py:61-77); the context tail carries the unspliced
                # body so the body schedule is unchanged
                f = face_model.apply(face_vars, aud_w, speaker,
                                     train=False)[0]
                jd = face_model.jaw_dim
                ed = face_model.expression_dim
                emit = jnp.concatenate(
                    [f[:, :jd], out[:, jd: out.shape[-1] - ed], f[:, jd:]],
                    axis=-1)
            if emit_dtype is not None:
                emit = emit.astype(emit_dtype)
            return emit, out[-ov:], jax.random.key_data(carry)

        return one

    # ------------------------------------------------------------------
    # session API (thread-safe)
    # ------------------------------------------------------------------
    def create_session(self, speaker: int = 0, seed: int = 0) -> str:
        with self._lock:
            if (self.max_sessions is not None
                    and len(self._sessions) >= self.max_sessions):
                raise EngineBusy(
                    f"{len(self._sessions)}/{self.max_sessions} sessions")
            sid = f"s{next(self._ids)}"
            slot = None
            if self.resident:
                if not self._free_slots:
                    raise EngineBusy(
                        f"all {self.resident_slots} resident slots held")
                slot = self._free_slots.pop()
            self._sessions[sid] = _Session(
                speaker=int(speaker),
                key_data=_host_key_data(seed),
                last_active=time.monotonic(), slot=slot)
            return sid

    def feed(self, sid: str, feats: np.ndarray, pump: bool = True) -> np.ndarray:
        """Append input: (T, aud_dim) features, or a (S,) 16 kHz waveform in
        raw-audio mode. With ``pump=True`` (default) runs the batching pump
        inline and returns any newly ready motion frames as (T_ready, C);
        with ``pump=False`` returns an empty chunk and leaves the work for
        ``pump_all()`` + ``poll()``."""
        feats = np.asarray(feats)
        if self.raw_audio:
            if feats.ndim != 1:
                raise ValueError(f"raw-audio mode feeds (S,) waveforms, "
                                 f"got {feats.shape}")
            if feats.dtype == np.int16 and self.wav_dtype == np.float32:
                feats = feats.astype(np.float32) / 32768.0
            elif feats.dtype != np.int16 and self.wav_dtype == np.int16:
                feats = np.clip(feats * 32768.0, -32768, 32767).astype(np.int16)
            elif feats.dtype != self.wav_dtype:
                feats = feats.astype(self.wav_dtype)
            feats = feats[:, None]
        else:
            feats = feats.astype(np.float32)
            if feats.ndim != 2 or feats.shape[1] != self.aud_dim:
                # validated HERE, per client, so a wrong-shaped feed is a
                # 400 for that caller — never a poisoned shared batch that
                # would kill the pump for every session
                raise ValueError(f"feats must be (T, {self.aud_dim}), "
                                 f"got {feats.shape}")
        with self._lock:
            s = self._get(sid)
            s.last_active = time.monotonic()
            s.feats.append(feats)
            s.n_feat += feats.shape[0]
            if s.ready_since is None and self._ready(s):
                s.ready_since = time.perf_counter()
            if not pump:
                return np.zeros((0, self.mot_dim), np.float32)
            self._pump()
            chunks = self._pop_chunks(s)
        return self._emit(chunks)       # D2H fetch OUTSIDE the engine lock

    def poll(self, sid: str, timeout: Optional[float] = None) -> np.ndarray:
        """Pop frames made ready by a ``pump_all()`` since the last poll.
        With a timeout, blocks until new frames (or the timeout) arrive."""
        with self._lock:
            s = self._get(sid)
            s.last_active = time.monotonic()
            if s.pending:
                chunks = self._pop_chunks(s)
            else:
                chunks, ev = None, s.new_frames
                if timeout:
                    s.waiters += 1       # a blocked poll is NOT an idle
                    # session: the GC sweep skips it (last_active only
                    # stamps at poll ENTRY, so a long wait would otherwise
                    # expire a clearly-attended session mid-wait)
        if chunks is not None:
            return self._emit(chunks)
        if timeout:
            try:
                ev.wait(timeout)
            finally:
                with self._lock:
                    w = self._sessions.get(sid)
                    if w is not None:
                        w.waiters -= 1
                        w.last_active = time.monotonic()
        with self._lock:
            s = self._sessions.get(sid)
            if s is None:
                raise SessionClosed(sid)
            chunks = self._pop_chunks(s)
        return self._emit(chunks)

    def pump_all(self) -> int:
        """Run the micro-batching pump over every ready session (the server
        pump thread's entry point). Returns the number of windows run."""
        with self._lock:
            if self.idle_ttl is not None:
                cut = time.monotonic() - self.idle_ttl
                for sid in [k for k, s in self._sessions.items()
                            if s.last_active < cut and s.waiters == 0]:
                    s = self._sessions.pop(sid)
                    s.closed = True
                    self._release_slot(s)
                    s.new_frames.set()       # unblock any waiting poll
                    self.stats["expired"] += 1
            before = self.stats["windows"]
            self._pump()
            return self.stats["windows"] - before

    def flush(self, sid: str) -> np.ndarray:
        """End of stream: run the final (edge-padded) windows, truncate to
        the true input length, close the session, and return every frame
        not yet delivered to the client."""
        w_units = self._units(self.window)
        with self._lock:
            s = self._get(sid)
            total_frames = self._frames_of(s.n_feat)
            delivered = s.emitted - sum(self._chunk_len(c) for c in s.pending)
            self._pump()
            while total_frames > s.emitted:
                buf = s.buffered()
                if buf.shape[0] == 0:
                    break
                need = (self._window_start(s.windows_done) + w_units
                        - s.trimmed)
                if buf.shape[0] < need:
                    pad = np.repeat(buf[-1:], need - buf.shape[0], axis=0)
                    s.feats = [np.concatenate([buf, pad], axis=0)]
                ran = self.stats["windows"]
                self._pump()
                if self.stats["windows"] == ran:
                    break
            chunks, s.pending = s.pending, []
            s.closed = True
            self._release_slot(s)
            s.new_frames.set()
            del self._sessions[sid]
        if not chunks:
            return np.zeros((0, self.mot_dim), np.float32)
        out = np.concatenate([self._materialize(c) for c in chunks], axis=0)
        # drop edge-pad frames past the true input length
        return self._post(out[: max(total_frames - delivered, 0)])

    def active_sessions(self) -> int:
        with self._lock:
            return len(self._sessions)

    def latency_stats(self) -> Dict[str, float]:
        """p50/p95/p99 over the last 512 windows: device wall per batched
        call and window-ready -> emitted queueing latency (both ms)."""
        with self._lock:
            out = {}
            for name, buf in (("batch_ms", self._batch_ms),
                              ("queue_ms", self._queue_ms)):
                if buf:
                    v = np.asarray(buf)
                    for p in (50, 95, 99):
                        out[f"{name}_p{p}"] = round(
                            float(np.percentile(v, p)), 2)
            return out

    # ------------------------------------------------------------------
    # internals (caller holds the lock)
    # ------------------------------------------------------------------
    def _get(self, sid: str) -> _Session:
        s = self._sessions.get(sid)
        if s is None or s.closed:
            raise SessionClosed(sid)
        return s

    def _release_slot(self, s: _Session):
        """Return a resident lane slot to the free list (lock held). Safe
        to recycle immediately: the next tenant's first window runs with
        first=1, which masks both the carried tail and the carried key."""
        if s.slot is not None:
            self._free_slots.append(s.slot)
            s.slot = None

    @staticmethod
    def _chunk_len(chunk) -> int:
        rec, _lane, skip = chunk
        return rec.t - skip

    @staticmethod
    def _materialize(chunk) -> np.ndarray:
        rec, lane, skip = chunk
        return rec.host()[lane, skip:]

    def _pop_chunks(self, s: _Session) -> list:
        """Detach pending output records (cheap, lock held); materializing
        them (multi-MB D2H) happens in ``_emit`` with the lock RELEASED so
        one client's download never stalls the pump or other sessions."""
        chunks, s.pending = s.pending, []
        s.new_frames.clear()
        return chunks

    def _emit(self, chunks: list) -> np.ndarray:
        if not chunks:
            return np.zeros((0, self.mot_dim), np.float32)
        out = np.concatenate([self._materialize(c) for c in chunks], axis=0)
        return self._post(out)

    def _window_start(self, w_idx: int) -> int:
        # window w covers input units [step*w, step*w + window) (frame
        # counts scaled by units-per-frame in raw-audio mode)
        return self._units(self.step) * w_idx

    def _ready(self, s: _Session) -> bool:
        return (not s.closed and
                s.trimmed + s.buffered().shape[0]
                >= self._window_start(s.windows_done) + self._units(self.window))

    def _pump(self):
        """Batch every ready session's next window until none is ready."""
        while True:
            ready = [sid for sid, s in self._sessions.items() if self._ready(s)]
            if not ready:
                return
            if self.resident:
                # first and continuation windows compile to different
                # programs (full-window vs step-only upload): partition.
                # Steady state is all-continuation; first-groups only
                # appear at session starts.
                firsts = [sid for sid in ready
                          if self._sessions[sid].windows_done == 0]
                conts = [sid for sid in ready
                         if self._sessions[sid].windows_done > 0]
                for i in range(0, len(firsts), self.max_batch):
                    self._run_group(firsts[i:i + self.max_batch])
                for i in range(0, len(conts), self.max_batch):
                    self._run_group(conts[i:i + self.max_batch], cont=True)
            else:
                for i in range(0, len(ready), self.max_batch):
                    self._run_group(ready[i:i + self.max_batch])

    def _run_group(self, sids: List[str], cont: bool = False):
        """Run one bucketed window batch. ``cont=True`` (resident mode
        only) marks an all-continuation group: every lane has prior
        windows, so the upload is only the new ``step`` units — the
        overlap's audio is read from the device audio-tail slots."""
        w_units = self._units(self.window)
        ov_units = self._units(self.overlap)
        ov, c = self.overlap, self.mot_dim
        w_up = w_units - ov_units if cont else w_units
        n = len(sids)
        bucket = _bucket(n, self.max_batch, self._granule)
        if self.raw_audio:
            aud = np.zeros((bucket, w_up), self.wav_dtype)
        else:
            aud = np.zeros((bucket, w_up, self.aud_dim), np.float32)
        tails = np.zeros((bucket, ov, c), np.float32)
        first = np.ones((bucket,), np.float32)
        n_valid = np.full((bucket,), self.window, np.int32)
        spk = np.zeros((bucket,), np.int32)
        # pad rows gather/scatter the reserved scratch slot (resident mode)
        slots = np.full((bucket,), self.resident_slots, np.int32)
        kds = []
        for i, sid in enumerate(sids):
            s = self._sessions[sid]
            rel = self._window_start(s.windows_done) - s.trimmed
            win = s.buffered()[rel + (ov_units if cont else 0):
                               rel + w_units]
            aud[i] = win[:, 0] if self.raw_audio else win
            if s.windows_done > 0:
                if not self.resident:    # resident tails never leave device
                    tails[i] = s.ctx_tail
                first[i] = 0.0
            # frames of TRUE (unpadded) input covered by this window — only
            # flush-padded tail windows fall short of a full window
            n_valid[i] = max(min(
                self._frames_of(s.n_feat) - self.step * s.windows_done,
                self.window), 1)
            spk[i] = s.speaker
            if self.resident:
                slots[i] = s.slot
            kds.append(s.key_data)
        for _ in range(bucket - n):      # pad rows: any key, output discarded
            kds.append(kds[-1])
        t0 = time.perf_counter()
        tails_np = kd_np = None
        if self.resident:
            if self._state_bufs is None:
                # +1 row: the scratch slot pad rows write (never read live)
                if self.raw_audio:
                    audt0 = jnp.zeros((self.resident_slots + 1, ov_units),
                                      jnp.int16 if self.wav_dtype == np.int16
                                      else jnp.float32)
                else:
                    audt0 = jnp.zeros(
                        (self.resident_slots + 1, ov_units, self.aud_dim),
                        jnp.float32)
                self._state_bufs = (
                    jnp.zeros((self.resident_slots + 1, ov, c), jnp.float32),
                    jnp.zeros((self.resident_slots + 1, 2), jnp.uint32),
                    audt0)
            bufs = self._state_bufs
            self._state_bufs = None      # donated: dead the moment we call
            try:
                if cont:
                    refined_dev, bufs, probe = self._step_res_cont(
                        self._variables, *bufs, jnp.asarray(slots),
                        jnp.asarray(aud), jnp.asarray(n_valid),
                        jnp.asarray(spk))
                else:
                    refined_dev, bufs, probe = self._step_res_first(
                        self._variables, *bufs, jnp.asarray(slots),
                        jnp.asarray(np.stack(kds)), jnp.asarray(aud),
                        jnp.asarray(n_valid), jnp.asarray(spk))
            except Exception:
                # a failed step must not silently zero carried state on
                # the next pump. If the donated inputs were never
                # consumed (error before dispatch) restore them — retry
                # semantics then match the host-carried path. If they
                # were consumed the whole buffer is gone, and it held
                # EVERY slot's carry: close each session that had prior
                # windows so clients see an error, never a wrong-context
                # continuation (first-window sessions carry nothing and
                # retry safely).
                if not bufs[0].is_deleted():
                    self._state_bufs = bufs
                else:
                    for sid, s in [(k, v) for k, v in self._sessions.items()
                                   if v.windows_done > 0]:
                        del self._sessions[sid]
                        s.closed = True
                        self._release_slot(s)
                        s.new_frames.set()
                raise
            self._state_bufs = bufs
            int(probe)                   # 4-byte fetch = completion barrier
        else:
            args = (jnp.asarray(np.stack(kds)), jnp.asarray(aud),
                    jnp.asarray(tails), jnp.asarray(first),
                    jnp.asarray(n_valid), jnp.asarray(spk))
            if self.mesh is not None:    # batch rows across the data axis
                from probtalk_tpu.parallel.mesh import shard_batch

                args = shard_batch(args, self.mesh)
            refined_dev, tails_dev, kd_dev = self._step_fn(
                self._variables, *args)
            # fetching the tiny tails + carried key data is the completion
            # barrier; the full refined windows stay on device and transfer
            # lazily at pop time
            tails_np = np.asarray(tails_dev)
            kd_np = np.asarray(kd_dev)
        now = time.perf_counter()
        rec = _BatchOut(refined_dev)
        self._batch_ms.append((now - t0) * 1e3)
        self.stats["windows"] += n
        self.stats["batches"] += 1
        self.stats["pad_rows"] += bucket - n
        for i, sid in enumerate(sids):
            s = self._sessions[sid]
            # a session with work flowing is alive by definition: refresh
            # the GC stamp at window completion, not only at feed/poll
            # entry — otherwise one slow batch (cold compile) can outlast
            # the TTL and expire the very session it is serving
            s.last_active = time.monotonic()
            skip = 0 if s.windows_done == 0 else ov
            if not self.resident:        # resident carry lives in the bufs
                s.ctx_tail = tails_np[i]
                s.key_data = kd_np[i]
            s.windows_done += 1
            s.emitted += self.window - skip
            # cont records were already overlap-trimmed on device
            s.pending.append((rec, i, 0 if cont else skip))
            # drop input units no later window re-reads: keeps a long-lived
            # stream's buffer at O(window), not O(stream length)
            drop = self._window_start(s.windows_done) - s.trimmed
            if drop > 0:
                s.feats = [s.buffered()[drop:]]
                s.trimmed += drop
            self._queue_ms.append((now - (s.ready_since or t0)) * 1e3)
            s.ready_since = (now if self._ready(s) else None)
            s.new_frames.set()

    def _post(self, x: np.ndarray) -> np.ndarray:
        return self.postprocess(x) if self.postprocess is not None else x


def _host_key_data(seed: int) -> np.ndarray:
    """uint32 key data equal to ``jax.random.key_data(jax.random.key(seed))``
    computed WITHOUT device ops: threefry2x32 (jax's default PRNG) seeds as
    the 64-bit seed split into [hi32, lo32]. create_session holds the global
    engine lock, and on the tunnel-attached backend an eager key build +
    key_data fetch costs device round-trips per session create — on the
    pump-adjacent path. Non-threefry impls fall back to the device build."""
    if jax.config.jax_default_prng_impl != "threefry2x32":
        return np.asarray(jax.random.key_data(jax.random.key(seed)))
    if jax.config.jax_enable_x64:
        s = int(seed) % (1 << 64)
        return np.array([s >> 32, s & 0xFFFFFFFF], np.uint32)
    # without x64 the seed canonicalizes to int32 first (hi word is 0)
    return np.array([0, int(seed) % (1 << 32)], np.uint32)


def _bucket(n: int, max_batch: int, granule: int = 1) -> int:
    b = granule
    while b < n:
        b *= 2
    return min(b, max_batch)
