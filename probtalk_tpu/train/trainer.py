"""Training driver: experiment dirs, epoch loop, logging, orbax checkpoints.

Capability of the reference's ``trainer/Trainer.py:24-266`` (seed setup,
timestamped train dir, config snapshot, resume, per-epoch loss averaging,
periodic checkpoint) redesigned around functional state: the model wrapper
no longer owns an optimizer or calls backward — the Trainer threads a
``TrainState`` through a jitted step function and checkpoints the whole
state pytree with orbax (including the PQ codebooks and EMA accumulators,
which torch kept as module buffers).
"""

from __future__ import annotations

import json
import logging
import os
import time
from datetime import datetime
from typing import Callable, Iterable, Optional

import numpy as np
import jax

logger = logging.getLogger("probtalk_tpu")


def setup_logging(train_dir: Optional[str] = None, level=logging.INFO):
    handlers = [logging.StreamHandler()]
    if train_dir:
        handlers.append(logging.FileHandler(os.path.join(train_dir, "train.log")))
    logging.basicConfig(
        level=level,
        format="%(asctime)s %(levelname)s %(message)s",
        handlers=handlers,
        force=True,
    )


def make_train_dir(root: str, exp_name: str, config=None) -> str:
    """Timestamped experiment dir with a config snapshot
    (reference Trainer.set_train_dir, trainer/Trainer.py:58-78)."""
    stamp = datetime.now().strftime("%Y-%m-%d-%H%M%S")
    train_dir = os.path.join(root, f"{stamp}-{exp_name}")
    os.makedirs(train_dir, exist_ok=True)
    if config is not None:
        with open(os.path.join(train_dir, "config.json"), "w") as f:
            json.dump(config.to_dict() if hasattr(config, "to_dict") else config, f,
                      indent=2)
    return train_dir


class Checkpointer:
    """Orbax wrapper: save/restore the full TrainState pytree per epoch
    (replaces torch.save nested dicts, trainer/Trainer.py:201-216)."""

    def __init__(self, directory: str, max_to_keep: int = 5):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True),
        )

    def save(self, epoch: int, state, wait: bool = False):
        self.mngr.save(epoch, args=self._ocp.args.StandardSave(state))
        if wait:
            self.mngr.wait_until_finished()

    def restore(self, state_template, epoch: Optional[int] = None):
        epoch = epoch if epoch is not None else self.mngr.latest_step()
        if epoch is None:
            return None, None
        restored = self.mngr.restore(
            epoch, args=self._ocp.args.StandardRestore(state_template)
        )
        return restored, epoch

    def latest_epoch(self) -> Optional[int]:
        return self.mngr.latest_step()


class Trainer:
    """Generic epoch-loop driver over a jitted train step.

    step_fn(state, batch, rng) -> (state, metrics); batches from an iterable
    factory (fresh iterator per epoch, reshuffled by epoch seed).
    """

    def __init__(
        self,
        step_fn: Callable,
        state,
        batch_factory: Callable[[int], Iterable],
        *,
        train_dir: Optional[str] = None,
        epochs: int = 100,
        seed: int = 0,
        print_every: int = 200,
        save_every: int = 10,
        checkpointer: Optional[Checkpointer] = None,
        device_put: Optional[Callable] = None,
        extra_batch_keys: Optional[Callable[[int], dict]] = None,
    ):
        self.step_fn = step_fn
        self.state = state
        self.batch_factory = batch_factory
        self.train_dir = train_dir
        self.epochs = epochs
        self.rng = jax.random.key(seed)
        self.print_every = print_every
        self.save_every = save_every
        self.checkpointer = checkpointer
        self.device_put = device_put or (lambda b: b)
        self.extra_batch_keys = extra_batch_keys
        self.start_epoch = 0
        self.global_step = 0

    def resume(self):
        """Restore the latest checkpoint if one exists
        (reference --resume, trainer/Trainer.py:50-51,80-86)."""
        if self.checkpointer is None:
            return False
        restored, epoch = self.checkpointer.restore(self.state)
        if restored is None:
            return False
        self.state = restored
        self.start_epoch = epoch + 1
        logger.info("resumed from epoch %d", epoch)
        return True

    def train_epoch(self, epoch: int):
        running: dict = {}
        count = 0
        t0 = time.time()
        for batch in self.batch_factory(epoch):
            if self.extra_batch_keys:
                batch = {**batch, **self.extra_batch_keys(epoch)}
            batch = self.device_put(batch)
            self.rng, k = jax.random.split(self.rng)
            self.state, metrics = self.step_fn(self.state, batch, k)
            count += 1
            self.global_step += 1
            for key, v in metrics.items():
                running[key] = running.get(key, 0.0) + float(v)
            if count % self.print_every == 0:
                avg = {k2: v / count for k2, v in running.items()}
                logger.info("epoch %d step %d | %s", epoch, self.global_step,
                            " ".join(f"{k2}={v:.4f}" for k2, v in avg.items()))
        dt = time.time() - t0
        avg = {k2: v / max(count, 1) for k2, v in running.items()}
        logger.info("epoch %d done (%d steps, %.1fs) | %s", epoch, count, dt,
                    " ".join(f"{k2}={v:.4f}" for k2, v in avg.items()))
        return avg

    def train(self):
        for epoch in range(self.start_epoch, self.epochs):
            self.train_epoch(epoch)
            if self.checkpointer and (
                (epoch + 1) % self.save_every == 0 or epoch == self.epochs - 1
            ):
                self.checkpointer.save(epoch, self.state)
        if self.checkpointer:
            self.checkpointer.mngr.wait_until_finished()
        return self.state
