"""Concrete Lie groups: R^n, SO(2), SO(3), SE(2), SE(3) and Bundle.

Parametrizations (all fixed-shape flat arrays; the same storage layout idea as
the upstream ``smooth`` library the reference builds on, chosen for stability
under composition rather than minimality):

=======  ==========  ====  =====================================
Group    nparams     ndof  storage
=======  ==========  ====  =====================================
Rn(n)    n           n     the vector itself
SO2      2           1     unit complex ``[re, im]``
SO3      4           3     unit quaternion ``[x, y, z, w]``
SE2      4           3     ``[tx, ty, re, im]``; tangent ``[vx, vy, w]``
SE3      7           6     ``[tx, ty, tz, qx, qy, qz, qw]``; tangent ``[v, w]``
Bundle   sum         sum   concatenation of the parts
=======  ==========  ====  =====================================

Closed forms are given for the hot operations; everything else inherits the
autodiff fallbacks from :class:`~smooth_feedback_tpu.groups.base.LieGroup`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import _series as se
from .base import LieGroup

# --------------------------------------------------------------------------- Rn


class Rn(LieGroup):
    """Euclidean translation group R^n (commutative)."""

    def __init__(self, n: int):
        self.n = int(n)
        self.nparams = self.n
        self.ndof = self.n

    def _key(self):
        return ("Rn", self.n)

    def identity(self, dtype=None):
        return jnp.zeros((self.n,), dtype=dtype)

    def exp(self, v):
        return v

    def log(self, g):
        return g

    def compose(self, a, b):
        return a + b

    def inverse(self, g):
        return -g

    def Ad(self, g):
        return jnp.eye(self.n, dtype=g.dtype)

    def ad(self, v):
        return jnp.zeros((self.n, self.n), dtype=v.dtype)

    def dr_exp(self, v):
        return jnp.eye(self.n, dtype=v.dtype)

    def dr_expinv(self, v):
        return jnp.eye(self.n, dtype=v.dtype)

    def d2r_exp(self, v):
        return jnp.zeros((self.n, self.n, self.n), dtype=v.dtype)

    def d2r_expinv(self, v):
        return jnp.zeros((self.n, self.n, self.n), dtype=v.dtype)

    def is_commutative(self):
        return True


# -------------------------------------------------------------------------- SO2


class _SO2(LieGroup):
    """Planar rotations, stored as a unit complex number ``[re, im]``."""

    nparams = 2
    ndof = 1

    def identity(self, dtype=None):
        return jnp.array([1.0, 0.0], dtype=dtype)

    def exp(self, v):
        w = v[0]
        return jnp.stack([jnp.cos(w), jnp.sin(w)])

    def log(self, g):
        return jnp.arctan2(g[1], g[0])[None]

    def compose(self, a, b):
        re = a[0] * b[0] - a[1] * b[1]
        im = a[0] * b[1] + a[1] * b[0]
        return jnp.stack([re, im])

    def inverse(self, g):
        return jnp.stack([g[0], -g[1]])

    def Ad(self, g):
        return jnp.ones((1, 1), dtype=g.dtype)

    def ad(self, v):
        return jnp.zeros((1, 1), dtype=v.dtype)

    def dr_exp(self, v):
        return jnp.ones((1, 1), dtype=v.dtype)

    def dr_expinv(self, v):
        return jnp.ones((1, 1), dtype=v.dtype)

    def d2r_exp(self, v):
        return jnp.zeros((1, 1, 1), dtype=v.dtype)

    def d2r_expinv(self, v):
        return jnp.zeros((1, 1, 1), dtype=v.dtype)

    def normalize(self, g):
        return g / jnp.linalg.norm(g)

    def matrix(self, g):
        return jnp.array([[g[0], -g[1]], [g[1], g[0]]])

    def is_commutative(self):
        return True


# -------------------------------------------------------------------------- SO3


def _hat3(w):
    """3x3 skew matrix of a 3-vector."""
    z = jnp.zeros((), dtype=w.dtype)
    return jnp.array(
        [
            [z, -w[2], w[1]],
            [w[2], z, -w[0]],
            [-w[1], w[0], z],
        ]
    )


def _so3_generators(dtype):
    """(3, 3, 3) stack with G[k] = d hat(v)/d v_k (the so(3) basis)."""
    G = np.zeros((3, 3, 3))
    G[0, 1, 2], G[0, 2, 1] = -1.0, 1.0
    G[1, 0, 2], G[1, 2, 0] = 1.0, -1.0
    G[2, 0, 1], G[2, 1, 0] = -1.0, 1.0
    return jnp.asarray(G, dtype=dtype)


def _quat_mul(a, b):
    """Hamilton product; storage [x, y, z, w]."""
    ax, ay, az, aw = a[0], a[1], a[2], a[3]
    bx, by, bz, bw = b[0], b[1], b[2], b[3]
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ]
    )


def _quat_rotmat(q):
    x, y, z, w = q[0], q[1], q[2], q[3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return jnp.array(
        [
            [1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)],
            [2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)],
            [2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)],
        ]
    )


class _SO3(LieGroup):
    """3-D rotations, stored as a unit quaternion ``[x, y, z, w]``."""

    nparams = 4
    ndof = 3

    def identity(self, dtype=None):
        return jnp.array([0.0, 0.0, 0.0, 1.0], dtype=dtype)

    def exp(self, v):
        th2 = v @ v
        xyz = 0.5 * se.sinc2(0.25 * th2) * v  # sin(th/2)/th * v
        w = se.cos2(0.25 * th2)
        return jnp.concatenate([xyz, w[None]])

    def log(self, q):
        # principal log: flip sign so the scalar part is nonnegative
        s = jnp.where(q[3] < 0, -1.0, 1.0)
        xyz = s * q[:3]
        w = s * q[3]
        n2 = xyz @ xyz
        small = n2 < 1e-12
        n = jnp.sqrt(jnp.where(small, jnp.ones_like(n2), n2))
        # th/n with th = 2 atan2(n, w); for small n, th/n ~ (2/w)(1 - n^2/(3w^2))
        scale_exact = 2.0 * jnp.arctan2(n, w) / n
        scale_small = 2.0 / jnp.maximum(w, 1e-12) * (1.0 - n2 / (3.0 * w * w))
        return jnp.where(small, scale_small, scale_exact) * xyz

    def compose(self, a, b):
        return _quat_mul(a, b)

    def inverse(self, q):
        return jnp.stack([-q[0], -q[1], -q[2], q[3]])

    def Ad(self, q):
        return _quat_rotmat(q)

    def ad(self, v):
        return _hat3(v)

    def dr_exp(self, v):
        th2 = v @ v
        H = _hat3(v)
        return jnp.eye(3, dtype=v.dtype) - se.cos1c2(th2) * H + se.sin3c2(th2) * (H @ H)

    def dr_expinv(self, v):
        th2 = v @ v
        H = _hat3(v)
        return jnp.eye(3, dtype=v.dtype) + 0.5 * H + se.jlinv2c2(th2) * (H @ H)

    # Closed-form second-order derivatives (the reference's flatten Hessians
    # consume d2r_exp/d2r_expinv via smooth's sparse static tables,
    # ocp_flatten.hpp:58-81; here: differentiate the coefficient form
    # c(theta^2) directly, grad_v c = 2 c'(theta^2) v).  Layout matches
    # jacfwd(dr_exp): out[i, j, k] = d dr_exp[i, j] / d v_k.
    def d2r_exp(self, v):
        th2 = v @ v
        H = _hat3(v)
        H2 = H @ H
        G = _so3_generators(v.dtype)  # (3, 3, 3): G[k] = d hat(v) / d v_k
        GH = jnp.einsum("kij,jl->ilk", G, H) + jnp.einsum("ij,kjl->ilk", H, G)
        c1, c2 = se.cos1c2(th2), se.sin3c2(th2)
        dc1, dc2 = 2.0 * se.dcos1c2(th2) * v, 2.0 * se.dsin3c2(th2) * v  # (3,)
        return (
            -H[:, :, None] * dc1[None, None, :]
            - c1 * jnp.moveaxis(G, 0, -1)
            + H2[:, :, None] * dc2[None, None, :]
            + c2 * GH
        )

    def d2r_expinv(self, v):
        th2 = v @ v
        H = _hat3(v)
        H2 = H @ H
        G = _so3_generators(v.dtype)
        GH = jnp.einsum("kij,jl->ilk", G, H) + jnp.einsum("ij,kjl->ilk", H, G)
        c3 = se.jlinv2c2(th2)
        dc3 = 2.0 * se.djlinv2c2(th2) * v
        return (
            0.5 * jnp.moveaxis(G, 0, -1)
            + H2[:, :, None] * dc3[None, None, :]
            + c3 * GH
        )

    def normalize(self, q):
        return q / jnp.linalg.norm(q)

    def matrix(self, q):
        return _quat_rotmat(q)

    def hat(self, v):
        return _hat3(v)


# -------------------------------------------------------------------------- SE2

_E2 = np.array([[0.0, -1.0], [1.0, 0.0]])


def _se2_generators(dtype):
    """(3, 3, 3) stack with G[k] = d ad(v)/d v_k (the se(2) adjoint basis)."""
    G = np.zeros((3, 3, 3))
    G[0, 1, 2] = -1.0
    G[1, 0, 2] = 1.0
    G[2, 0, 1], G[2, 1, 0] = -1.0, 1.0
    return jnp.asarray(G, dtype=dtype)


class _SE2(LieGroup):
    """Planar rigid motions; storage ``[tx, ty, re, im]``, tangent ``[vx, vy, w]``."""

    nparams = 4
    ndof = 3

    def identity(self, dtype=None):
        return jnp.array([0.0, 0.0, 1.0, 0.0], dtype=dtype)

    def _rot(self, g):
        return jnp.array([[g[2], -g[3]], [g[3], g[2]]])

    def exp(self, v):
        rho, w = v[:2], v[2]
        A = se.sinc(w)
        Bw = se.cos1c(w) * w
        V = jnp.array([[A, -Bw], [Bw, A]])
        t = V @ rho
        return jnp.concatenate([t, jnp.stack([jnp.cos(w), jnp.sin(w)])])

    def log(self, g):
        w = jnp.arctan2(g[3], g[2])
        al = se.acos_over_sinc(w)  # A/(2B)
        Vinv = jnp.array([[al, 0.5 * w], [-0.5 * w, al]])
        rho = Vinv @ g[:2]
        return jnp.concatenate([rho, w[None]])

    def compose(self, a, b):
        Ra = self._rot(a)
        t = a[:2] + Ra @ b[:2]
        re = a[2] * b[2] - a[3] * b[3]
        im = a[2] * b[3] + a[3] * b[2]
        return jnp.concatenate([t, jnp.stack([re, im])])

    def inverse(self, g):
        Rt = self._rot(g).T
        return jnp.concatenate([-(Rt @ g[:2]), jnp.stack([g[2], -g[3]])])

    def Ad(self, g):
        R = self._rot(g)
        col = jnp.stack([g[1], -g[0]])  # -E2 @ t
        top = jnp.concatenate([R, col[:, None]], axis=1)
        bot = jnp.array([[0.0, 0.0, 1.0]], dtype=g.dtype)
        return jnp.concatenate([top, bot], axis=0)

    def ad(self, v):
        w = v[2]
        z = jnp.zeros((), dtype=v.dtype)
        return jnp.array(
            [
                [z, -w, v[1]],
                [w, z, -v[0]],
                [z, z, z],
            ]
        )

    # Closed-form right Jacobians.  The se(2) adjoint matrix A = ad(v)
    # satisfies A^3 = -w^2 A (same minimal polynomial as the so(3) hat), so
    # the exp/expinv coefficient functions of SO(3) apply verbatim:
    #   dr_exp(v)    = I - cos1c(w) A + sin3c(w) A^2
    #   dr_expinv(v) = I + A/2 + jlinv2c(w) A^2
    # (role of smooth's dr_expinv_sparse consumed at mpc.hpp:293-301).
    def dr_exp(self, v):
        w2 = v[2] * v[2]
        A = self.ad(v)
        return (
            jnp.eye(3, dtype=v.dtype) - se.cos1c2(w2) * A + se.sin3c2(w2) * (A @ A)
        )

    def dr_expinv(self, v):
        w2 = v[2] * v[2]
        A = self.ad(v)
        return jnp.eye(3, dtype=v.dtype) + 0.5 * A + se.jlinv2c2(w2) * (A @ A)

    # Second-order forms: A is linear in v with constant generators, and the
    # coefficients depend on v only through w = v[2].
    def d2r_exp(self, v):
        w = v[2]
        A = self.ad(v)
        A2 = A @ A
        G = _se2_generators(v.dtype)
        GA = jnp.einsum("kij,jl->ilk", G, A) + jnp.einsum("ij,kjl->ilk", A, G)
        w2 = w * w
        c1, c2 = se.cos1c2(w2), se.sin3c2(w2)
        dw = jnp.array([0.0, 0.0, 1.0], v.dtype) * (2.0 * w)  # d(w^2)/dv
        dc1, dc2 = se.dcos1c2(w2) * dw, se.dsin3c2(w2) * dw
        return (
            -A[:, :, None] * dc1[None, None, :]
            - c1 * jnp.moveaxis(G, 0, -1)
            + A2[:, :, None] * dc2[None, None, :]
            + c2 * GA
        )

    def d2r_expinv(self, v):
        w = v[2]
        A = self.ad(v)
        A2 = A @ A
        G = _se2_generators(v.dtype)
        GA = jnp.einsum("kij,jl->ilk", G, A) + jnp.einsum("ij,kjl->ilk", A, G)
        w2 = w * w
        c3 = se.jlinv2c2(w2)
        dc3 = se.djlinv2c2(w2) * jnp.array([0.0, 0.0, 1.0], v.dtype) * (2.0 * w)
        return (
            0.5 * jnp.moveaxis(G, 0, -1)
            + A2[:, :, None] * dc3[None, None, :]
            + c3 * GA
        )

    def normalize(self, g):
        n = jnp.linalg.norm(g[2:])
        return jnp.concatenate([g[:2], g[2:] / n])

    def matrix(self, g):
        R = self._rot(g)
        top = jnp.concatenate([R, g[:2, None]], axis=1)
        bot = jnp.array([[0.0, 0.0, 1.0]], dtype=g.dtype)
        return jnp.concatenate([top, bot], axis=0)


# -------------------------------------------------------------------------- SE3


class _SE3(LieGroup):
    """Rigid motions in 3-D; storage ``[t(3), q(4)]``, tangent ``[v(3), w(3)]``."""

    nparams = 7
    ndof = 6

    def identity(self, dtype=None):
        return jnp.array([0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0], dtype=dtype)

    def exp(self, x):
        v, w = x[:3], x[3:]
        th2 = w @ w
        H = _hat3(w)
        # left Jacobian of SO(3)
        Jl = jnp.eye(3, dtype=x.dtype) + se.cos1c2(th2) * H + se.sin3c2(th2) * (H @ H)
        t = Jl @ v
        q = SO3.exp(w)
        return jnp.concatenate([t, q])

    def log(self, g):
        t, q = g[:3], g[3:]
        w = SO3.log(q)
        th2 = w @ w
        H = _hat3(w)
        Jlinv = jnp.eye(3, dtype=g.dtype) - 0.5 * H + se.jlinv2c2(th2) * (H @ H)
        v = Jlinv @ t
        return jnp.concatenate([v, w])

    def compose(self, a, b):
        Ra = _quat_rotmat(a[3:])
        t = a[:3] + Ra @ b[:3]
        q = _quat_mul(a[3:], b[3:])
        return jnp.concatenate([t, q])

    def inverse(self, g):
        qi = SO3.inverse(g[3:])
        Ri = _quat_rotmat(qi)
        return jnp.concatenate([-(Ri @ g[:3]), qi])

    def Ad(self, g):
        R = _quat_rotmat(g[3:])
        tR = _hat3(g[:3]) @ R
        z = jnp.zeros((3, 3), dtype=g.dtype)
        return jnp.block([[R, tR], [z, R]])

    def ad(self, x):
        hv = _hat3(x[:3])
        hw = _hat3(x[3:])
        z = jnp.zeros((3, 3), dtype=x.dtype)
        return jnp.block([[hw, hv], [z, hw]])

    # Closed-form right Jacobians via the Q-block form [Barfoot, "State
    # Estimation for Robotics", eq. 7.86]:
    #   dl_exp(v, w)  = [[Jl3(w), Q(v, w)], [0, Jl3(w)]]
    #   dr_exp(x)     = dl_exp(-x)
    #   dr_expinv(x)  = [[Ji, -Ji Q(-v,-w) Ji], [0, Ji]],  Ji = SO3.dr_expinv(w)
    # (the role of smooth's sparse tables in the reference's flatten layer,
    # ocp_flatten.hpp:58-81).
    @staticmethod
    def _Q(rho, phi):
        """Barfoot's Q: the translation-rotation coupling block of dl_exp."""
        th2 = phi @ phi
        rh = _hat3(rho)
        ph = _hat3(phi)
        pr = ph @ rh
        rp = rh @ ph
        prp = pr @ ph
        pp = ph @ ph
        m1 = se.sin3c2(th2)  # (t - sin t)/t^3
        m2 = se.cos4c2(th2)  # (1 - t^2/2 - cos t)/t^4  (negative near 0)
        m3 = se.sin5c2(th2)  # (t - sin t - t^3/6)/t^5  (negative near 0)
        return (
            0.5 * rh
            + m1 * (pr + rp + prp)
            - m2 * (pp @ rh + rh @ pp - 3.0 * prp)
            - 0.5 * (m2 - 3.0 * m3) * (prp @ ph + ph @ prp)
        )

    def dr_exp(self, x):
        v, w = -x[:3], -x[3:]
        Jl = SO3.dr_exp(-w)  # = dl_exp of SO(3) at w
        Q = self._Q(v, w)
        z = jnp.zeros((3, 3), dtype=x.dtype)
        return jnp.block([[Jl, Q], [z, Jl]])

    def dr_expinv(self, x):
        v, w = -x[:3], -x[3:]
        Ji = SO3.dr_expinv(x[3:])  # = Jl3(w)^{-1} since Jr(w) = Jl(-w)
        Q = self._Q(v, w)
        z = jnp.zeros((3, 3), dtype=x.dtype)
        return jnp.block([[Ji, -(Ji @ Q @ Ji)], [z, Ji]])

    # Closed-form second-order derivatives (replacing the jacfwd sweep over
    # dr_exp; role of smooth's static sparse second-order tables consumed by
    # the reference's flatten Hessians, ocp_flatten.hpp:58-81).  _Q is LINEAR
    # in rho, so the rho-derivative is _Q evaluated at basis vectors; the
    # phi-derivative differentiates each hat-product with the so(3)
    # generators and the scalar coefficients via the d*-series.
    @staticmethod
    def _dQ_dphi(rho, phi):
        """(3, 3, 3): out[k] = d _Q(rho, phi) / d phi_k."""
        th2 = phi @ phi
        rh = _hat3(rho)
        ph = _hat3(phi)
        G = _so3_generators(phi.dtype)  # G[k] = d hat(phi) / d phi_k
        m1, m2, m3 = se.sin3c2(th2), se.cos4c2(th2), se.sin5c2(th2)
        dm1 = 2.0 * se.dsin3c2(th2) * phi  # (3,)
        dm2 = 2.0 * se.dcos4c2(th2) * phi
        dm3 = 2.0 * se.dsin5c2(th2) * phi

        pr = ph @ rh
        rp = rh @ ph
        prp = pr @ ph
        pp = ph @ ph
        T1 = pr + rp + prp
        T2 = pp @ rh + rh @ pp - 3.0 * prp
        T3 = prp @ ph + ph @ prp

        L = lambda A, B: jnp.einsum("kij,jl->kil", A, B)  # (3,3,3)x(3,3)
        R = lambda A, B: jnp.einsum("ij,kjl->kil", A, B)  # (3,3)x(3,3,3)
        dpr = L(G, rh)
        drp = R(rh, G)
        dprp = L(dpr, ph) + R(pr, G)
        dpp = L(G, ph) + R(ph, G)
        dT1 = dpr + drp + dprp
        dT2 = L(dpp, rh) + R(rh, dpp) - 3.0 * dprp
        dT3 = L(dprp, ph) + R(prp, G) + L(G, prp) + R(ph, dprp)

        return (
            dm1[:, None, None] * T1[None]
            + m1 * dT1
            - dm2[:, None, None] * T2[None]
            - m2 * dT2
            - 0.5 * (dm2 - 3.0 * dm3)[:, None, None] * T3[None]
            - 0.5 * (m2 - 3.0 * m3) * dT3
        )

    def _dQr_blocks(self, x):
        """(3, 3, 6): derivative of the dr_exp Q-block ``_Q(-v, -w)`` w.r.t.
        the full tangent x = (v, w)."""
        rho, phi = -x[:3], -x[3:]
        eye = jnp.eye(3, dtype=x.dtype)
        # linear in rho: d/dv_k _Q(-v, -w) = _Q(-e_k, phi)
        dQ_v = jnp.stack([self._Q(-eye[k], phi) for k in range(3)])  # (3,3,3)
        dQ_w = -self._dQ_dphi(rho, phi)  # chain through phi = -w
        return jnp.moveaxis(jnp.concatenate([dQ_v, dQ_w], axis=0), 0, -1)

    def d2r_exp(self, x):
        # full-precision scope: these are public numeric entry points with no
        # scoped pipeline consumer; TPU bf16-default matmuls would silently
        # corrupt the hat-product chains (~1e-2, measured)
        with jax.default_matmul_precision("highest"):
            wx = x[3:]
            z336 = jnp.zeros((3, 3, 6), dtype=x.dtype)
            dJ = jnp.concatenate(
                [jnp.zeros((3, 3, 3), dtype=x.dtype), SO3.d2r_exp(wx)], axis=2
            )  # (3,3,6): Jr depends on w only
            dQ = self._dQr_blocks(x)
            # assemble [[dJ, dQ], [0, dJ]] per derivative direction
            top = jnp.concatenate([dJ, dQ], axis=1)
            bot = jnp.concatenate([z336, dJ], axis=1)
            return jnp.concatenate([top, bot], axis=0)

    def d2r_expinv(self, x):
        with jax.default_matmul_precision("highest"):
            wx = x[3:]
            Ji = SO3.dr_expinv(wx)
            Q = self._Q(-x[:3], -wx)
            dJi = jnp.concatenate(
                [jnp.zeros((3, 3, 3), dtype=x.dtype), SO3.d2r_expinv(wx)], axis=2
            )  # (3,3,6)
            dQ = self._dQr_blocks(x)
            # d(-Ji Q Ji) by product rule, batched over the derivative axis
            dB = -(
                jnp.einsum("ijk,jl,lm->imk", dJi, Q, Ji)
                + jnp.einsum("ij,jlk,lm->imk", Ji, dQ, Ji)
                + jnp.einsum("ij,jl,lmk->imk", Ji, Q, dJi)
            )
            z336 = jnp.zeros((3, 3, 6), dtype=x.dtype)
            top = jnp.concatenate([dJi, dB], axis=1)
            bot = jnp.concatenate([z336, dJi], axis=1)
            return jnp.concatenate([top, bot], axis=0)

    def normalize(self, g):
        return jnp.concatenate([g[:3], g[3:] / jnp.linalg.norm(g[3:])])

    def matrix(self, g):
        R = _quat_rotmat(g[3:])
        top = jnp.concatenate([R, g[:3, None]], axis=1)
        bot = jnp.array([[0.0, 0.0, 0.0, 1.0]], dtype=g.dtype)
        return jnp.concatenate([top, bot], axis=0)


# ----------------------------------------------------------------------- Bundle


class Bundle(LieGroup):
    """Direct product of Lie groups; storage is the concatenated parts.

    Mirrors the role of ``smooth::Bundle`` in the reference's examples (e.g.
    the SE(2) x R^3 vehicle state of examples/ocp_se2.hpp).
    """

    def __init__(self, *parts: LieGroup):
        self.parts = tuple(parts)
        self.nparams = sum(p.nparams for p in self.parts)
        self.ndof = sum(p.ndof for p in self.parts)
        self._poff = np.cumsum([0] + [p.nparams for p in self.parts])
        self._doff = np.cumsum([0] + [p.ndof for p in self.parts])

    def _key(self):
        return ("Bundle",) + tuple(p._key() for p in self.parts)

    def _psplit(self, g):
        return [g[self._poff[i] : self._poff[i + 1]] for i in range(len(self.parts))]

    def _dsplit(self, v):
        return [v[self._doff[i] : self._doff[i + 1]] for i in range(len(self.parts))]

    def identity(self, dtype=None):
        return jnp.concatenate([p.identity(dtype=dtype) for p in self.parts])

    def exp(self, v):
        return jnp.concatenate([p.exp(vi) for p, vi in zip(self.parts, self._dsplit(v))])

    def log(self, g):
        return jnp.concatenate([p.log(gi) for p, gi in zip(self.parts, self._psplit(g))])

    def compose(self, a, b):
        return jnp.concatenate(
            [p.compose(ai, bi) for p, ai, bi in zip(self.parts, self._psplit(a), self._psplit(b))]
        )

    def inverse(self, g):
        return jnp.concatenate([p.inverse(gi) for p, gi in zip(self.parts, self._psplit(g))])

    def _blockdiag(self, blocks):
        return jax.scipy.linalg.block_diag(*blocks)

    def Ad(self, g):
        return self._blockdiag([p.Ad(gi) for p, gi in zip(self.parts, self._psplit(g))])

    def ad(self, v):
        return self._blockdiag([p.ad(vi) for p, vi in zip(self.parts, self._dsplit(v))])

    def dr_exp(self, v):
        return self._blockdiag([p.dr_exp(vi) for p, vi in zip(self.parts, self._dsplit(v))])

    def dr_expinv(self, v):
        return self._blockdiag([p.dr_expinv(vi) for p, vi in zip(self.parts, self._dsplit(v))])

    def _blockdiag3(self, tensors, dtype):
        """(ndof, ndof, ndof) block-diagonal assembly of per-part (d, d, d)
        second-order tensors: cross-part derivatives vanish on a direct
        product (closed form replacing the base-class jacfwd sweep)."""
        out = jnp.zeros((self.ndof, self.ndof, self.ndof), dtype=dtype)
        for i, t in enumerate(tensors):
            o = int(self._doff[i])
            d = int(self._doff[i + 1] - o)
            out = out.at[o : o + d, o : o + d, o : o + d].set(t)
        return out

    def d2r_exp(self, v):
        return self._blockdiag3(
            [p.d2r_exp(vi) for p, vi in zip(self.parts, self._dsplit(v))], v.dtype
        )

    def d2r_expinv(self, v):
        return self._blockdiag3(
            [p.d2r_expinv(vi) for p, vi in zip(self.parts, self._dsplit(v))], v.dtype
        )

    def normalize(self, g):
        return jnp.concatenate([p.normalize(gi) for p, gi in zip(self.parts, self._psplit(g))])

    def is_commutative(self):
        return all(p.is_commutative() for p in self.parts)


# Singletons
SO2 = _SO2()
SO3 = _SO3()
SE2 = _SE2()
SE3 = _SE3()
