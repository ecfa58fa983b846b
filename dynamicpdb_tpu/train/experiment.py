"""Training runtime: jitted train step, optimizer, epoch loop, checkpoints.

Replaces the reference Experiment class (train_DFOLD_dynamics.py:343-1568):
  * one fused jit step = on-device featurization + forward diffusion + model
    forward + loss + grad + Adam(amsgrad) update (the reference splits this
    across DataLoader workers (CPU numpy/scipy), a torch forward, and DDP
    allreduce);
  * data parallel via a Mesh + batch sharding (jit emits the grad psum);
  * checkpoints carry params AND optimizer state + step/epoch (the reference
    saves optimizer state but never restores it, train:468-499).
"""
from __future__ import annotations

import logging
import time
import jax
import jax.numpy as jnp
import numpy as np
import optax

from dynamicpdb_tpu.config import Config
from dynamicpdb_tpu.data.featurize import diffuse_training_window, featurize_window
from dynamicpdb_tpu.diffusion.se3_diffuser import SE3Diffuser
from dynamicpdb_tpu.models.score_network import DFoldScoreNetwork, score_forward
from dynamicpdb_tpu.parallel import mesh as mesh_lib
from dynamicpdb_tpu.train.losses import dfold_loss

log = logging.getLogger(__name__)


class Trainer:
    """Owns model/diffuser/optimizer and the compiled train step."""

    def __init__(self, cfg: Config, mesh=None):
        self.cfg = cfg
        self.model = DFoldScoreNetwork(cfg.model)
        self.diffuser = SE3Diffuser(cfg.diffuser)
        from dynamicpdb_tpu.train.optim import make_optimizer

        self.optimizer = make_optimizer(cfg.experiment)
        self.mesh = mesh
        # residue-axis sequence parallelism (parallel/sp.py) is activated
        # ONLY around the compiled train step's trace/call (see
        # compiled_train_step) — never globally: a process-wide toggle here
        # would bake this mesh's 'seq' constraints into any OTHER jit traced
        # meanwhile (eval sampling, another trainer's init), a review-caught
        # hazard.
        self._train_step = None
        self._opt_shardings = None
        self._param_shardings = None

    # -- setup ----------------------------------------------------------------
    def init_params(self, key, sample_window: dict):
        unroll = getattr(self.cfg.experiment, "unroll_steps", 1)
        if unroll > 1:
            # the raw window carries F+K-1 frames (unrolled training,
            # _window_loss); the model itself only ever sees F-frame
            # windows — init on the first slice
            f_raw = sample_window["atom37"].shape[0]
            need = f_raw - (unroll - 1)
            sample_window = dict(
                sample_window,
                **{
                    k: sample_window[k][:need]
                    for k in ("atom37", "force", "vel")
                    if k in sample_window
                },
            )
        # jit the init chain: eager execution would dispatch thousands of
        # tiny ops one-by-one (pathological over remote-device transports)
        @jax.jit
        def _init(key, window):
            feats = featurize_window(window)
            feats = diffuse_training_window(
                key, feats, self.diffuser, self.cfg.data.min_t
            )
            return self.model.init(key, feats)

        params = _init(key, jax.tree_util.tree_map(jnp.asarray, sample_window))
        # strip weak types: otherwise step outputs get different avals than
        # the init-time inputs and the first 2-3 train steps each re-trace
        # the whole graph (tens of seconds for the flagship model)
        params = jax.tree_util.tree_map(
            lambda x: jax.lax.convert_element_type(x, x.dtype), params
        )
        opt_state = self.optimizer.init(params)
        if self.mesh is not None:
            # place params (replicated, or 'model'-sharded when the mesh
            # has that axis) and the moments (ZeRO over 'data') in their
            # final shards at init; cache the sharding trees so
            # compiled_train_step's in/out_shardings match exactly
            from dynamicpdb_tpu.parallel import sharding as sharding_lib

            self._param_shardings = sharding_lib.tree_shardings(
                params, self.mesh
            )
            params = jax.tree_util.tree_map(
                lambda v, s: jax.device_put(v, s), params,
                self._param_shardings,
            )
            self._opt_shardings = self.opt_state_shardings(opt_state)
            if self._opt_shardings is not None:
                opt_state = jax.tree_util.tree_map(
                    lambda v, s: jax.device_put(v, s), opt_state,
                    self._opt_shardings,
                )
        return params, opt_state

    # -- the step -------------------------------------------------------------
    def _one_step_loss(self, params, key, raw_window, rigid_overrides=()):
        """One denoising step's loss on one raw window. Returns
        (loss, aux, pred_rigids_last [N,7]).

        rigid_overrides: optional ((position, [N,7] tensor7), ...) pairs
        substituted into rigids_0 AFTER featurization — the unrolled
        training path feeds earlier predictions back through here, the
        same seam the autoregressive rollout slides
        (sampling/reverse.py rollout)."""
        # three INDEPENDENT streams (a round-3 review found the old
        # re-split of `key` made k_drop identical to k_sc, perfectly
        # correlating the CFG drop with the self-conditioning coin flip)
        k_diff, k_sc, k_drop = jax.random.split(key, 3)
        feats = featurize_window(raw_window)
        if rigid_overrides:
            r0 = feats["rigids_0"]
            for pos, rig in rigid_overrides:
                r0 = r0.at[pos].set(rig)
            feats["rigids_0"] = r0
        ec = self.cfg.experiment
        if ec.cond_noise_trans > 0 or ec.cond_noise_rot_deg > 0:
            # exposure-bias robustifier (opt-in; featurize.py docstring).
            # fold_in rather than a 4-way split so the default path's RNG
            # streams are untouched — enabling the knob must not silently
            # reshuffle every other random draw of a parity run
            from dynamicpdb_tpu.data.featurize import perturb_conditioning_rigids

            feats["rigids_0"] = perturb_conditioning_rigids(
                jax.random.fold_in(key, 0x5E3),
                feats["rigids_0"],
                ec.cond_noise_trans,
                ec.cond_noise_rot_deg * jnp.pi / 180.0,
            )
        feats = diffuse_training_window(
            k_diff, feats, self.diffuser, self.cfg.data.min_t
        )
        drop_ref = False
        if self.cfg.model.cfg_drop_rate > 0:
            # per-window conditioning dropout for classifier-free guidance
            drop_ref = (
                jax.random.uniform(k_drop) < self.cfg.model.cfg_drop_rate
            ).astype(jnp.float32)
        if self.cfg.model.embed.embed_self_conditioning:
            # behavioral parity with the reference (train:1201-1207): 50%
            # of steps use an extra no-grad forward's predicted CA
            # positions as sc_ca_t (passing through drop_ref like the
            # reference's _self_conditioning). With the DFOLDv2 embedder
            # this feature is never consumed (SURVEY §4 known defect), so
            # the flag defaults off. NOTE: under vmap the lax.cond lowers
            # to a select that COMPUTES both branches every step, so the
            # enabled-cost is ~2x forward on every window rather than the
            # reference's 1.5x average — semantics identical, schedule of
            # compute not.
            feats["sc_ca_t"] = jnp.zeros_like(feats["rigids_0"][..., 4:])

            def with_sc(f):
                sc = score_forward(
                    self.model, jax.lax.stop_gradient(params),
                    self.diffuser, f, drop_ref=drop_ref,
                )
                return dict(f, sc_ca_t=jax.lax.stop_gradient(sc["rigids"][..., 4:]))

            feats = jax.lax.cond(
                jax.random.uniform(k_sc) > 0.5, with_sc, lambda f: dict(f),
                feats,
            )
        out = score_forward(
            self.model, params, self.diffuser, feats, drop_ref=drop_ref
        )
        loss, aux = dfold_loss(out, feats, self.cfg.experiment)
        return loss, aux, out["rigids"][-1]

    def _window_loss(self, params, key, raw_window):
        """Loss for one raw window; dispatches on experiment.unroll_steps.

        unroll_steps=1 (default, reference semantics): one denoising step
        on the window, loss on the last frame.

        unroll_steps=K>1 (beyond-reference, opt-in): scheduled-sampling /
        rollout-consistent training. The raw window must carry F+K-1
        frames (set data.frame_time accordingly); the model's window stays
        F frames. Step s slices frames [s, s+F) and substitutes every
        conditioning slot that a previous step already predicted — the
        EXACT feedback seam the autoregressive rollout uses — then takes a
        normal denoising loss on its target frame. Losses average over
        steps; gradients flow THROUGH the fed-back rigids (differentiable
        unroll), so step s's prediction is trained to be useful as step
        s+1's conditioning, not just to match GT. Motivation + measured
        effect: the 1000-frame divergence analysis
        (docs/artifacts/rollout_quality_1000.json, docs/DESIGN.md)."""
        ec = self.cfg.experiment
        unroll = getattr(ec, "unroll_steps", 1)
        if unroll <= 1:
            loss, aux, _ = self._one_step_loss(params, key, raw_window)
            return loss, aux
        f_raw = raw_window["atom37"].shape[0]
        need = f_raw - (unroll - 1)  # the model's window length F
        if need < 2:
            raise ValueError(
                f"unroll_steps={unroll} needs windows of >= {unroll + 1} "
                f"frames (got {f_raw}); raise data.frame_time"
            )
        keys = jax.random.split(key, unroll)
        preds: list = []  # predicted rigids for raw frames need-1+s
        losses, auxs = [], []
        for s in range(unroll):
            raw_s = dict(
                raw_window,
                **{
                    k: raw_window[k][s : s + need]
                    for k in ("atom37", "force", "vel")
                },
            )
            overrides = []
            for p in range(need - 1):
                j = s + p - (need - 1)  # raw frame s+p, predicted at step j
                if j >= 0:
                    overrides.append((p, preds[j]))
            loss, aux, pred = self._one_step_loss(
                params, keys[s], raw_s, tuple(overrides)
            )
            preds.append(pred)
            losses.append(loss)
            auxs.append(aux)
        loss = jnp.mean(jnp.stack(losses))
        aux = jax.tree_util.tree_map(
            lambda *xs: jnp.mean(jnp.stack(xs)), *auxs
        )
        return loss, aux

    def _keyed_loss(self, params, keys, raw_batch):
        """Mean loss over a batch with per-window keys already split."""
        losses, aux = jax.vmap(self._window_loss, in_axes=(None, 0, 0))(
            params, keys, raw_batch
        )
        return jnp.mean(losses), jax.tree_util.tree_map(jnp.mean, aux)

    def loss_fn(self, params, key, raw_batch):
        """Mean loss over a [B, ...] batch of raw windows."""
        bsz = raw_batch["atom37"].shape[0]
        return self._keyed_loss(params, jax.random.split(key, bsz), raw_batch)

    def train_step(self, params, opt_state, key, raw_batch):
        accum = getattr(self.cfg.experiment, "grad_accum", 1)
        bsz = jax.tree_util.tree_leaves(raw_batch)[0].shape[0]
        if accum > 1 and bsz % accum:
            # loud error, not a silent full-batch fallback: the user set
            # accum to FIT memory — degrading quietly would OOM or train
            # with a different memory profile than configured
            raise ValueError(
                f"grad_accum={accum} must divide the batch size ({bsz})"
            )
        if accum > 1:
            # micro-batch the SAME per-window keys the unaccumulated step
            # would draw, scan over [accum, B/accum] chunks accumulating
            # gradients, then ONE optimizer update. Gradients are linear
            # and chunks are equal-sized, so the update is identical to the
            # full-batch step at 1/accum the activation memory
            # (tests/test_train.py::test_grad_accum_matches_full_batch).
            keys = jax.random.split(key, bsz)
            # layout-agnostic: typed keys split to (bsz,), legacy threefry
            # to (bsz, 2), rbg to (bsz, 4)
            keys = keys.reshape((accum, bsz // accum) + keys.shape[1:])
            chunks = jax.tree_util.tree_map(
                lambda x: x.reshape((accum, bsz // accum) + x.shape[1:]),
                raw_batch,
            )

            def body(carry, xs):
                k, chunk = xs
                (loss, aux), g = jax.value_and_grad(
                    self._keyed_loss, has_aux=True
                )(params, k, chunk)
                acc = jax.tree_util.tree_map(jnp.add, carry, g)
                return acc, aux

            zero = jax.tree_util.tree_map(jnp.zeros_like, params)
            gsum, auxs = jax.lax.scan(body, zero, (keys, chunks))
            grads = jax.tree_util.tree_map(lambda g: g / accum, gsum)
            aux = jax.tree_util.tree_map(jnp.mean, auxs)
        else:
            (loss, aux), grads = jax.value_and_grad(
                self.loss_fn, has_aux=True
            )(params, key, raw_batch)
        updates, opt_state = self.optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        aux["grad_norm"] = optax.global_norm(grads)
        return params, opt_state, aux

    def multi_train_step(self, params, opt_state, key, raw_batches):
        """K fused optimizer steps in ONE device computation: lax.scan over
        a [K, B, ...] batch stack. Amortizes per-call dispatch (important on
        high-latency transports) and lets XLA overlap step boundaries."""
        K = jax.tree_util.tree_leaves(raw_batches)[0].shape[0]
        keys = jax.random.split(key, K)

        def body(carry, xs):
            params, opt_state = carry
            k, batch = xs
            params, opt_state, aux = self.train_step(params, opt_state, k, batch)
            return (params, opt_state), aux

        (params, opt_state), auxs = jax.lax.scan(
            body, (params, opt_state), (keys, raw_batches)
        )
        return params, opt_state, jax.tree_util.tree_map(
            lambda x: x[-1], auxs
        )

    def opt_state_shardings(self, opt_state):
        """ZeRO-1 shardings for the optimizer state on this trainer's mesh
        (replicated when disabled / single-device / no 'data' axis)."""
        from dynamicpdb_tpu.parallel import sharding as sharding_lib

        if (
            self.mesh is not None
            and getattr(self.cfg.experiment, "zero_opt_state", False)
            and self.mesh.shape.get("data", 1) > 1
        ):
            return sharding_lib.opt_state_shardings(opt_state, self.mesh)
        if self.mesh is not None:
            rep = mesh_lib.replicated(self.mesh)
            return jax.tree_util.tree_map(lambda _: rep, opt_state)
        return None

    def compiled_train_step(self, opt_state=None):
        """jit once; with a mesh, shard the batch over 'data' and let XLA
        place the gradient all-reduce on ICI. Pass the opt_state template
        to also shard the AMSGrad moments over 'data' (ZeRO-1,
        experiment.zero_opt_state)."""
        if self._train_step is None:
            donate = (0, 1)
            if self.mesh is not None:
                bspec = mesh_lib.batch_sharding(self.mesh)
                rspec = mesh_lib.replicated(self.mesh)
                pspec = getattr(self, "_param_shardings", None) or rspec
                ospec = (
                    self.opt_state_shardings(opt_state)
                    if opt_state is not None
                    else getattr(self, "_opt_shardings", None)
                ) or rspec
                step = jax.jit(
                    self.train_step,
                    donate_argnums=donate,
                    in_shardings=(pspec, ospec, rspec, bspec),
                    out_shardings=(pspec, ospec, rspec),
                )

                def stepped(*args, _step=step):
                    # jit traces lazily at the first CALL: pin this
                    # trainer's sequence-parallel state (parallel/sp.py)
                    # for the trace so interleaved trainers over different
                    # meshes (tests, eval harnesses) can't cross-wire the
                    # global toggle. Compiled-cache hits make the context
                    # manager the only per-call cost.
                    from dynamicpdb_tpu.parallel import sp

                    with sp.activated(self.mesh):
                        return _step(*args)

                self._train_step = stepped
            else:
                step = jax.jit(self.train_step, donate_argnums=donate)

                def stepped(*args, _step=step):
                    from dynamicpdb_tpu.parallel import sp

                    with sp.activated(None):
                        return _step(*args)

                self._train_step = stepped
        return self._train_step


class Experiment:
    """Epoch loop + logging + checkpointing around a Trainer."""

    def __init__(self, cfg: Config, data_iter_factory, sample_window: dict,
                 mesh=None, eval_fn=None, eval_every: int = 0,
                 metrics_writer=None):
        self.cfg = cfg
        self.trainer = Trainer(cfg, mesh=mesh)
        self.data_iter_factory = data_iter_factory  # epoch -> Iterator[raw batch]
        self.eval_fn = eval_fn  # params -> dict of metrics (lower = better)
        self.eval_every = eval_every  # epochs between evals (0 = off)
        self.metrics_writer = metrics_writer
        self.key = jax.random.PRNGKey(cfg.experiment.seed)
        self.key, init_key = jax.random.split(self.key)
        self.params, self.opt_state = self.trainer.init_params(
            init_key, sample_window
        )
        self.step = 0
        self.epoch = 0
        # best-metric tracking (reference _init_best_eval, train:428-438)
        self.best = {}
        n_params = sum(x.size for x in jax.tree_util.tree_leaves(self.params))
        log.info("model parameters: %.1fM", n_params / 1e6)

    def _run_eval(self):
        # eval must trace under the SAME sequence-parallel state as
        # training: at long N the unsharded eval forward would OOM exactly
        # where SP training fits (parallel/sp.py). activated() is a no-op
        # for meshes without a 'seq' axis.
        from dynamicpdb_tpu.parallel import sp

        with sp.activated(self.trainer.mesh):
            metrics = self.eval_fn(self.params)
        if self.metrics_writer is not None:
            self.metrics_writer.write(self.step, {f"eval/{k}": v for k, v in metrics.items()})
        improved = []
        for k, v in metrics.items():
            if k not in self.best or v < self.best[k]:
                self.best[k] = v
                improved.append(k)
        log.info(
            "eval @ step %d: %s%s", self.step,
            " ".join(f"{k}={v:.4f}" for k, v in metrics.items()),
            f" (new best: {', '.join(improved)})" if improved else "",
        )
        if improved and self.cfg.experiment.ckpt_dir:
            self.save_checkpoint(
                f"{self.cfg.experiment.ckpt_dir}/best.ckpt"
            )
        return metrics

    def train(self, num_epochs: int | None = None, max_steps: int | None = None):
        cfg = self.cfg.experiment
        step_fn = self.trainer.compiled_train_step(self.opt_state)
        mesh = self.trainer.mesh
        history = []
        rolling = []
        t_log = time.time()
        epochs = num_epochs if num_epochs is not None else cfg.num_epoch
        from dynamicpdb_tpu.data.prefetch import prefetch_to_device

        place = (
            (lambda b: mesh_lib.shard_batch(mesh, b))
            if mesh is not None
            else jax.device_put
        )
        for epoch in range(self.epoch, self.epoch + epochs):
            batches = prefetch_to_device(
                self.data_iter_factory(epoch), buffer_size=2, place=place
            )
            # close() on every exit path: an abandoned prefetcher leaves its
            # worker blocked in q.put pinning device-resident batches
            with batches:
                for raw_batch in batches:
                    self.key, step_key = jax.random.split(self.key)
                    self.params, self.opt_state, aux = step_fn(
                        self.params, self.opt_state, step_key, raw_batch
                    )
                    self.step += 1
                    rolling.append(aux)
                    if self.step == 1 or self.step % cfg.log_freq == 0:
                        means = {
                            k: float(np.mean([float(a[k]) for a in rolling]))
                            for k in rolling[0]
                        }
                        dt = time.time() - t_log
                        sps = len(rolling) / dt if dt > 0 else float("inf")
                        log.info(
                            "epoch %d step %d: %s steps/sec=%.3f",
                            epoch, self.step,
                            " ".join(f"{k}={v:.4f}" for k, v in means.items()),
                            sps,
                        )
                        history.append({"step": self.step, **means, "steps_per_sec": sps})
                        if self.metrics_writer is not None:
                            self.metrics_writer.write(
                                self.step, {**means, "steps_per_sec": sps}
                            )
                        rolling = []
                        t_log = time.time()
                    if max_steps is not None and self.step >= max_steps:
                        # partial epoch: resume restarts it (window draws
                        # are random per step, so no data is skipped)
                        self.epoch = epoch
                        return history
            # epoch COMPLETED: resume must start at the next one (storing
            # `epoch` itself made every warm start re-run its last epoch)
            self.epoch = epoch + 1
            if (
                self.eval_fn is not None and self.eval_every
                and epoch % self.eval_every == 0
            ):
                self._run_eval()
            if cfg.ckpt_dir and epoch and epoch % cfg.ckpt_freq == 0:
                self.save_checkpoint()
        return history

    # -- checkpointing ---------------------------------------------------------
    def save_checkpoint(self, path: str | None = None):
        from dynamicpdb_tpu.train import checkpoint as ckpt

        path = path or f"{self.cfg.experiment.ckpt_dir}/step_{self.step}.ckpt"
        ckpt.save(path, self.params, self.opt_state, self.step, self.epoch, self.cfg)
        log.info("checkpoint written: %s", path)
        return path

    def load_checkpoint(self, path: str):
        from dynamicpdb_tpu.train import checkpoint as ckpt

        state = ckpt.restore(path, self.params, self.opt_state)
        self.params = state["params"]
        if state.get("opt_state") is not None:
            self.opt_state = state["opt_state"]
        self.step = state["step"]
        self.epoch = state["epoch"]
