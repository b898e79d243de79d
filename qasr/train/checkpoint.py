"""Orbax checkpointing: full train state, sharding-aware, best-PER pointer.

Reference capability: Keras ModelCheckpoint HDF5 weights with best-on-dev-PER
selection + manual resume (SURVEY.md §5 checkpoint/resume; mount empty).
TPU-native plan: orbax-checkpoint saves the complete state (params, opt
state, step, PRNG key) multi-host-safely; restore resumes the latest complete
step; a `best` pointer file tracks the dev-PER-selected step.
"""

from __future__ import annotations

import json
import os

import jax
import orbax.checkpoint as ocp

from qasr.configs import Config


class CheckpointManager:
    def __init__(self, cfg: Config, *, write_config: bool = True):
        self.dir = os.path.abspath(cfg.train.checkpoint_dir)
        os.makedirs(self.dir, exist_ok=True)
        self.mgr = ocp.CheckpointManager(
            self.dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=cfg.train.keep_checkpoints,
                create=True,
            ),
        )
        # serialize the config next to the checkpoints (reproducibility);
        # read-only consumers (qasr.infer) pass write_config=False so they
        # never clobber the training run's record
        if write_config and jax.process_index() == 0:
            with open(os.path.join(self.dir, "config.json"), "w") as f:
                f.write(cfg.to_json())

    def save(self, step: int, state, *, dev_per: float | None = None,
             data_state: dict | None = None):
        self.mgr.save(step, args=ocp.args.StandardSave(state))
        if data_state is not None and jax.process_index() == 0:
            with open(os.path.join(self.dir, f"data_state_{step}.json"), "w") as f:
                json.dump(data_state, f)
        if dev_per is not None and jax.process_index() == 0:
            best_path = os.path.join(self.dir, "best.json")
            best = {"step": -1, "dev_per": float("inf")}
            if os.path.exists(best_path):
                with open(best_path) as f:
                    best = json.load(f)
            if dev_per < best["dev_per"]:
                with open(best_path, "w") as f:
                    json.dump({"step": step, "dev_per": dev_per}, f)

    def wait(self):
        self.mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self.mgr.latest_step()

    def best_step(self) -> int | None:
        best_path = os.path.join(self.dir, "best.json")
        if os.path.exists(best_path):
            with open(best_path) as f:
                return json.load(f)["step"]
        return None

    def restore(self, step: int, target_state):
        """Restore into the structure/shardings of `target_state`."""
        return self.mgr.restore(step, args=ocp.args.StandardRestore(target_state))

    def all_steps(self) -> list[int]:
        return list(self.mgr.all_steps())

    def restore_params(self, step: int, cfg: Config, sample_features):
        """Params-only restore for inference.

        The non-param subtrees (optimizer moments = 2/3 of the checkpoint
        bytes, step counter, dropout key) are marked `ocp.PLACEHOLDER` so
        Orbax never reads or materializes them, and the target structure
        comes from `jax.eval_shape` so nothing is initialized on device
        either — peak memory is exactly one params tree. Uses a dedicated
        read-only manager because PLACEHOLDER needs the PyTree handler,
        while `save` binds this manager's item to the Standard handler.
        """
        import jax
        import jax.numpy as jnp
        import numpy as np

        from qasr.train.state import create_train_state

        feats = jax.ShapeDtypeStruct(np.shape(sample_features), jnp.float32)
        abstract = jax.eval_shape(
            lambda f: create_train_state(cfg, jax.random.PRNGKey(0), f), feats
        )
        target = abstract.replace(
            step=ocp.PLACEHOLDER,
            dropout_rng=ocp.PLACEHOLDER,
            opt_state=jax.tree.map(lambda _: ocp.PLACEHOLDER, abstract.opt_state),
        )
        with ocp.CheckpointManager(self.dir) as read_mgr:
            restored = read_mgr.restore(step, args=ocp.args.PyTreeRestore(item=target))
        return restored.params

    def restore_data_state(self, step: int) -> dict | None:
        path = os.path.join(self.dir, f"data_state_{step}.json")
        if os.path.exists(path):
            with open(path) as f:
                return json.load(f)
        return None
