"""Independent NumPy f64 oracle re-deriving the reference C++ semantics.

This is a deliberately *separate* implementation (plain NumPy, loops, no JAX)
of the ukfom/MTK conventions and of the filter process/measurement models, so
that the JAX framework can be validated against it (SURVEY.md §4 item 2:
"golden-trajectory tests vs the C++ reference ... in slow NumPy f64 oracle
form"). Any shared bug would have to be independently re-introduced here.

It also doubles as the single-core C++-semantics performance stand-in used by
``bench.py`` to estimate the reference's filter-updates/sec baseline.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# quaternion ops ([w,x,y,z]), independent formulations where possible
# ---------------------------------------------------------------------------


def q_mul(q, p):
    w1, v1 = q[0], q[1:]
    w2, v2 = p[0], p[1:]
    w = w1 * w2 - v1 @ v2
    v = w1 * v2 + w2 * v1 + np.cross(v1, v2)
    return np.concatenate([[w], v])


def q_conj(q):
    return np.array([q[0], -q[1], -q[2], -q[3]])


def q_rot(q, v):
    return q_to_mat(q) @ v


def q_to_mat(q):
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def q_exp(v):
    theta = np.linalg.norm(v)
    if theta < 1e-10:
        return np.concatenate([[np.cos(theta / 2)], (0.5 - theta**2 / 48.0) * v])
    return np.concatenate([[np.cos(theta / 2)], np.sin(theta / 2) * v / theta])


def q_log(q):
    if q[0] < 0:
        q = -q
    n = np.linalg.norm(q[1:])
    if n < 1e-12:
        return 2.0 / max(q[0], 1e-6) * q[1:]
    theta = 2.0 * np.arctan2(n, q[0])
    return theta * q[1:] / n


def so3_boxplus(q, d, scale=1.0):
    out = q_mul(q, q_exp(np.asarray(d) * scale))
    return out / np.linalg.norm(out)


def so3_boxminus(a, b):
    return q_log(q_mul(q_conj(b), a))


# ---------------------------------------------------------------------------
# generic manifold UKF with ukfom conventions (loops, no vectorization)
# ---------------------------------------------------------------------------


class EuclidPart:
    def __init__(self, dim):
        self.dim = dim

    def boxplus(self, x, d, scale=1.0):
        return x + scale * d

    def boxminus(self, a, b):
        return a - b


class SO3Part:
    dim = 3

    def boxplus(self, x, d, scale=1.0):
        return so3_boxplus(x, d, scale)

    def boxminus(self, a, b):
        return so3_boxminus(a, b)


class Mat33Part:
    """3×3 matrix field with column-major 9-vector tangent (MTK::matrix)."""

    dim = 9

    def boxplus(self, x, d, scale=1.0):
        return x + scale * np.reshape(d, (3, 3), order="F")

    def boxminus(self, a, b):
        return np.reshape(a - b, 9, order="F")


class OracleManifold:
    """Product manifold over named parts; state = dict name->np.array."""

    def __init__(self, parts):
        self.parts = parts  # list[(name, part)]
        self.dof = sum(p.dim for _, p in parts)

    def boxplus(self, x, delta, scale=1.0):
        out = {}
        off = 0
        for name, p in self.parts:
            out[name] = p.boxplus(x[name], delta[off : off + p.dim], scale)
            off += p.dim
        return out

    def boxminus(self, a, b):
        out = np.zeros(self.dof)
        off = 0
        for name, p in self.parts:
            out[off : off + p.dim] = np.ravel(p.boxminus(a[name], b[name]))
            off += p.dim
        return out

    def mean(self, points, tol=1e-12, max_iters=64):
        m = {k: np.copy(v) for k, v in points[0].items()}
        for _ in range(max_iters):
            delta = np.mean([self.boxminus(p, m) for p in points], axis=0)
            m = self.boxplus(m, delta)
            if np.linalg.norm(delta) <= tol:
                break
        return m


def oracle_sigma_points(manifold, mu, cov):
    n = manifold.dof
    L = np.linalg.cholesky(cov)
    pts = [mu]
    for j in range(n):
        pts.append(manifold.boxplus(mu, L[:, j]))
        pts.append(manifold.boxplus(mu, -L[:, j]))
    return pts


def oracle_predict(manifold, mu, cov, f, Q):
    X = oracle_sigma_points(manifold, mu, cov)
    Y = [f(x) for x in X]
    mu_y = manifold.mean(Y)
    D = np.stack([manifold.boxminus(y, mu_y) for y in Y])
    return mu_y, 0.5 * D.T @ D + Q


def oracle_update(manifold, mu, cov, z, h, R, gate=None):
    n = manifold.dof
    L = np.linalg.cholesky(cov)
    deltas = [np.zeros(n)]
    for j in range(n):
        deltas.append(L[:, j])
        deltas.append(-L[:, j])
    X = [manifold.boxplus(mu, d) for d in deltas]
    Z = np.stack([np.ravel(h(x)) for x in X])
    z_mean = Z.mean(axis=0)
    dZ = Z - z_mean
    S = 0.5 * dZ.T @ dZ + R
    DX = np.stack([manifold.boxminus(x, mu) for x in X])
    C = 0.5 * DX.T @ dZ
    S_inv = np.linalg.inv(S)
    K = C @ S_inv
    nu = np.ravel(z) - z_mean
    m2 = nu @ S_inv @ nu
    if gate is not None and m2 > gate:
        return mu, cov, m2, False
    return manifold.boxplus(mu, K @ nu), cov - K @ S @ K.T, m2, True


# ---------------------------------------------------------------------------
# vehicle dynamics oracle (same physical conventions, independent code path)
# ---------------------------------------------------------------------------


def oracle_calc_efforts(M, Dl, Dq, W, B, cog, cob, acc, vel, q):
    v, w = vel[:3], vel[3:]
    p1 = M[:3] @ vel
    p2 = M[3:] @ vel
    coriolis = np.concatenate([np.cross(w, p1), np.cross(w, p2) + np.cross(v, p1)])
    damping = Dl @ vel + Dq @ (np.abs(vel) * vel)
    up = q_to_mat(q).T @ np.array([0.0, 0.0, 1.0])
    f_ext = up * (B - W)
    tau_ext = np.cross(cog, -up * W) + np.cross(cob, up * B)
    g = -np.concatenate([f_ext, tau_ext])
    return M @ acc + coriolis + damping + g


def oracle_sim_step(M, Dl, Dq, W, B, cog, cob, state, tau, dt, integrate_pose=True):
    """state = dict(position, orientation, linear_velocity, angular_velocity)

    Forward dynamics by inverting the inverse-dynamics oracle: with acc = 0,
    ``oracle_calc_efforts`` returns exactly the coriolis+damping+gravity sum,
    so M·acc = tau − efforts(acc=0). One copy of the effort-term physics."""
    vel = np.concatenate([state["linear_velocity"], state["angular_velocity"]])
    bias = oracle_calc_efforts(
        M, Dl, Dq, W, B, cog, cob, np.zeros(6), vel, state["orientation"]
    )
    acc = np.linalg.solve(M, tau - bias)
    lin = state["linear_velocity"] + dt * acc[:3]
    ang = state["angular_velocity"] + dt * acc[3:]
    out = dict(state)
    out["linear_velocity"] = lin
    out["angular_velocity"] = ang
    if integrate_pose:
        out["position"] = state["position"] + dt * (q_to_mat(state["orientation"]) @ lin)
        out["orientation"] = so3_boxplus(state["orientation"], ang, dt)
    return out


# ---------------------------------------------------------------------------
# VelocityUKF oracle (reference semantics: VelocityUKF.cpp)
# ---------------------------------------------------------------------------

VEL_MANIFOLD = OracleManifold([("velocity", EuclidPart(3)), ("z_position", EuclidPart(1))])


class OracleVelocityUKF:
    def __init__(self, mu, cov, M, Dl, Dq, W, B, cog, cob):
        self.mu = {k: np.copy(v) for k, v in mu.items()}
        self.cov = np.copy(cov)
        self.dyn = (M, Dl, Dq, W, B, cog, cob)
        self.body_efforts = np.zeros(6)
        self.angular_velocity = np.zeros(3)
        self.tracker = {
            "position": np.zeros(3),
            "orientation": np.array([1.0, 0, 0, 0]),
            "linear_velocity": np.copy(mu["velocity"]),
            "angular_velocity": np.zeros(3),
        }
        self.Q = np.zeros((4, 4))
        self.Q[:3, :3] = 1e-4 * np.eye(3)

    def predict(self, dt):
        orientation = self.tracker["orientation"]

        def f(chi):
            seed = {
                "position": np.zeros(3),
                "orientation": orientation,
                "linear_velocity": chi["velocity"],
                "angular_velocity": self.angular_velocity,
            }
            sim = oracle_sim_step(*self.dyn, seed, self.body_efforts, dt, integrate_pose=False)
            newv = sim["linear_velocity"]
            zv = (q_to_mat(orientation) @ newv)[2]
            return {"velocity": newv, "z_position": chi["z_position"] + dt * zv}

        self.mu, self.cov = oracle_predict(VEL_MANIFOLD, self.mu, self.cov, f, dt * self.Q)
        self.tracker = oracle_sim_step(
            *self.dyn, self.tracker, self.body_efforts, dt, integrate_pose=True
        )

    def update_dvl(self, z, R):
        self.mu, self.cov, _, _ = oracle_update(
            VEL_MANIFOLD, self.mu, self.cov, z, lambda s: s["velocity"], R
        )

    def update_pressure(self, z, R):
        self.mu, self.cov, _, _ = oracle_update(
            VEL_MANIFOLD, self.mu, self.cov, z, lambda s: s["z_position"], R
        )

    def set_gyro(self, rates):
        self.angular_velocity = np.copy(rates)
        self.tracker["angular_velocity"] = np.copy(rates)

    def set_efforts(self, tau):
        self.body_efforts = np.copy(tau)
