"""SE(3) diffusion: SO(3) x R^3 product diffusion over rigid backbone frames.

TPU-first redesign of the reference SE3Diffuser
(/root/reference/src/data/se3_diffuser.py): the reference round-trips
device -> numpy -> scipy Rotation -> device on *every* call
(_extract_trans_rots / _assemble_rigid, se3_diffuser.py:11-29) — the top perf
bug called out in SURVEY.md §3. Here rotations stay quaternions on device;
rotvec conversion is jnp (ops/so3), so forward noising, score computation and
the full reverse sampler are jittable and scan-able.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from dynamicpdb_tpu.diffusion.r3_diffuser import R3Config, R3Diffuser
from dynamicpdb_tpu.diffusion.so3_diffuser import SO3Config, SO3Diffuser
from dynamicpdb_tpu.ops import so3
from dynamicpdb_tpu.ops.rigid import Rigid


@dataclasses.dataclass(frozen=True)
class SE3Config:
    diffuse_rot: bool = True
    diffuse_trans: bool = True
    so3: SO3Config = dataclasses.field(default_factory=SO3Config)
    r3: R3Config = dataclasses.field(default_factory=R3Config)


class SE3Diffuser:
    def __init__(self, conf: SE3Config = SE3Config()):
        self.conf = conf
        self.so3d = SO3Diffuser(conf.so3)
        self.r3d = R3Diffuser(conf.r3)

    # -- training-time forward noising ---------------------------------------
    def forward_marginal(self, key, rigids_0: Rigid, t, diffuse_mask=None):
        """Noise clean frames to time t (se3_diffuser.py:43-110).

        Args:
            rigids_0: clean frames, batch shape [..., N].
            t: scalar diffusion time in (0, 1].
        Returns dict with rigids_t (tensor-7), trans_score, rot_score and the
        scalar score scalings.
        """
        k_rot, k_trans = jax.random.split(key)
        rot_0 = so3.quat_to_rotvec(rigids_0.quat)
        trans_0 = rigids_0.trans

        if self.conf.diffuse_rot:
            rot_t, rot_score = self.so3d.forward_marginal(k_rot, rot_0, t)
            rot_score_scaling = self.so3d.score_scaling(t)
        else:
            rot_t = rot_0
            rot_score = jnp.zeros_like(rot_0)
            rot_score_scaling = jnp.ones_like(jnp.asarray(t, jnp.float32))

        if self.conf.diffuse_trans:
            trans_t, trans_score = self.r3d.forward_marginal(k_trans, trans_0, t)
            trans_score_scaling = self.r3d.score_scaling(t)
        else:
            trans_t = trans_0
            trans_score = jnp.zeros_like(trans_0)
            trans_score_scaling = jnp.ones_like(jnp.asarray(t, jnp.float32))

        if diffuse_mask is not None:
            m = diffuse_mask[..., None]
            rot_t = m * rot_t + (1 - m) * rot_0
            trans_t = m * trans_t + (1 - m) * trans_0
            rot_score = m * rot_score
            trans_score = m * trans_score

        rigids_t = Rigid(so3.rotvec_to_quat(rot_t), trans_t)
        return {
            "rigids_t": rigids_t.to_tensor_7(),
            "trans_score": trans_score,
            "rot_score": rot_score,
            "trans_score_scaling": trans_score_scaling,
            "rot_score_scaling": rot_score_scaling,
        }

    # -- model-side score conversions ----------------------------------------
    def calc_rot_score(self, quats_t, quats_0, t):
        """Rotation score from noisy/predicted quats (se3_diffuser.py:119-125).

        rotvec_0t = Log(q_0^{-1} ⊗ q_t); score = IGSO3 score at rotvec_0t.
        ``t`` has the leading batch (frame) shape.
        """
        quats_0t = so3.quat_multiply(so3.quat_invert(quats_0), quats_t)
        rotvec_0t = so3.quat_to_rotvec(quats_0t)
        return self.so3d.score(rotvec_0t, t)

    def calc_trans_score(self, trans_t, trans_0, t, scale: bool = True):
        return self.r3d.score(trans_t, trans_0, t, scale=scale)

    def score_scaling(self, t):
        return self.so3d.score_scaling(t), self.r3d.score_scaling(t)

    # -- reverse sampling -------------------------------------------------------
    def reverse(
        self,
        key,
        rigid_t: Rigid,
        rot_score,
        trans_score,
        t,
        dt,
        diffuse_mask=None,
        center: bool = True,
        noise_scale: float = 1.0,
    ) -> Rigid:
        """One reverse step from t to t - dt (se3_diffuser.py:160-215),
        fully on device."""
        k_rot, k_trans = jax.random.split(key)
        rot_t = so3.quat_to_rotvec(rigid_t.quat)
        trans_t = rigid_t.trans

        if self.conf.diffuse_rot:
            rot_t_1 = self.so3d.reverse(
                k_rot, rot_t, rot_score, t, dt, noise_scale=noise_scale
            )
        else:
            rot_t_1 = rot_t
        if self.conf.diffuse_trans:
            trans_t_1 = self.r3d.reverse(
                k_trans, trans_t, trans_score, t, dt,
                center=center, noise_scale=noise_scale,
            )
        else:
            trans_t_1 = trans_t

        if diffuse_mask is not None:
            m = diffuse_mask[..., None]
            rot_t_1 = m * rot_t_1 + (1 - m) * rot_t
            trans_t_1 = m * trans_t_1 + (1 - m) * trans_t
        return Rigid(so3.rotvec_to_quat(rot_t_1), trans_t_1)

    def sample_ref(self, key, shape):
        """Sample frames from the t=1 reference distribution; shape = batch
        dims (e.g. (F, N)). Returns tensor-7 (se3_diffuser.py:217-280)."""
        k_rot, k_trans = jax.random.split(key)
        rot_ref = self.so3d.sample_ref(k_rot, shape)
        trans_ref = self.r3d._unscale(self.r3d.sample_ref(k_trans, shape))
        return Rigid(so3.rotvec_to_quat(rot_ref), trans_ref).to_tensor_7()
