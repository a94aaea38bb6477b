"""ESDF-gradient trajectory optimization / sampling MPC (north-star layer).

The reference library exposes distance+gradient queries for external planners
(GetDistWithGradTrilinear, src/ESDFMap.cpp:481-540) but ships no planner.
BASELINE.json's north star specifies the TPU-native build must close the
loop: >=1e4 sampled quadrotor rollouts per control step against the ESDF,
plus an ESDF-gradient refinement matching the classic gradient planner.

Design (TPU-first):
  * dynamics: double-integrator point-mass with velocity/accel limits — the
    standard model for ESDF-based quadrotor local planners; rollouts are a
    ``lax.scan`` over the horizon, vmapped over rollouts (one big batched
    gather per step into the distance grid).
  * MPPI: K perturbed control sequences, softmax-weighted update
    (information-theoretic MPC); K is the natural sharding axis — scenario
    batches split across devices, a single psum reduces the weighted update.
  * gradient refinement: a few Adam steps on the winning sequence through
    ``jax.grad`` of the trilinear-interpolated collision cost — exactly the
    "ESDF-gradient planner" pattern, with the gradient given analytically by
    the interpolant (same closed form the reference derives by hand).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import FiestaConfig
from ..ops.query import get_dist_grad_trilinear, get_distance


@dataclasses.dataclass(frozen=True)
class MPCConfig:
    horizon: int = 30
    dt: float = 0.1
    n_rollouts: int = 16384           # >= 1e4 (north star)
    temperature: float = 0.5          # MPPI lambda
    sigma: float = 1.5                # control noise std (m/s^2)
    a_max: float = 6.0
    v_max: float = 3.0
    margin: float = 0.6               # desired clearance (m)
    w_collision: float = 200.0
    w_goal: float = 5.0
    w_terminal: float = 50.0
    w_effort: float = 0.05
    refine_steps: int = 8
    refine_lr: float = 0.3
    # Distance lookup used for the MPPI *sampling* stage: "nearest" reads
    # one voxel per query point (1/8th the gather traffic of trilinear;
    # the <= half-voxel quantization is ~4% of the default margin and the
    # gradient refinement stage always uses the exact trilinear form).
    sample_query: str = "nearest"
    # The grid passed to plan_step is a SIGNED distance field
    # (pipeline.sdf_grid / query.signed_distance_grid, component C18):
    # interior penetration is graded — deeper inside an obstacle costs
    # more — instead of every in-obstacle sample reading the flat d=0
    # penalty an unsigned grid gives.  Out-of-map queries then read
    # -trunc_dist (deepest penetration) rather than the reference's -1
    # sentinel, which a signed field cannot distinguish from 1 m depth.
    signed: bool = False


class PlanResult(NamedTuple):
    controls: jax.Array        # [H,3] optimized control sequence
    positions: jax.Array       # [H,3] resulting trajectory
    cost: jax.Array            # scalar cost of the plan
    best_sample_cost: jax.Array
    mean_sample_cost: jax.Array


def rollout_positions(mpc: MPCConfig, p0, v0, controls):
    """Integrate controls [..,H,3] from (p0,v0) -> positions [..,H,3]."""

    def step(carry, a):
        p, v = carry
        v = jnp.clip(v + a * mpc.dt, -mpc.v_max, mpc.v_max)
        p = p + v * mpc.dt
        return (p, v), p

    (_, _), ps = jax.lax.scan(step, (p0, v0), controls, unroll=4)
    return ps


def _rollout_positions_soa(mpc: MPCConfig, p0, v0, controls_soa):
    """Batched rollout in component layout: controls [H,3,K] -> positions
    [H,3,K].  The K rollouts ride the 128-lane axis at full width; the
    [K,H,3] form keeps the length-3 coordinate axis minormost (3/128 lane
    utilization — the same layout tax PERF.md round 3 measured on the
    mapping tick's pose einsum)."""

    def step(carry, a):
        p, v = carry                        # [3, K] each
        v = jnp.clip(v + a * mpc.dt, -mpc.v_max, mpc.v_max)
        p = p + v * mpc.dt
        return (p, v), p

    k = controls_soa.shape[-1]
    p0b = jnp.broadcast_to(p0[:, None], (3, k))
    v0b = jnp.broadcast_to(v0[:, None], (3, k))
    (_, _), ps = jax.lax.scan(step, (p0b, v0b), controls_soa, unroll=4)
    return ps


def _nearest_distance_soa(cfg: FiestaConfig, dist, px, py, pz):
    """get_distance semantics on component arrays ([...,] each): nearest
    voxel via a z-column row gather, out-of-grid -> infinity, out-of-map
    -> UNDEFINED_DIST."""
    from ..grid import UNDEFINED_DIST

    gx, gy, gz = cfg.grid_shape
    res = cfg.resolution
    ox, oy, oz = cfg.origin
    sx, sy, sz = cfg.map_size
    in_map = ((px >= ox) & (px <= ox + sx) & (py >= oy) & (py <= oy + sy)
              & (pz >= oz) & (pz <= oz + sz))
    ix = jnp.floor((px - ox) / res).astype(jnp.int32)
    iy = jnp.floor((py - oy) / res).astype(jnp.int32)
    iz = jnp.floor((pz - oz) / res).astype(jnp.int32)
    inside = ((ix >= 0) & (ix < gx) & (iy >= 0) & (iy < gy)
              & (iz >= 0) & (iz < gz))
    lin = jnp.clip(ix, 0, gx - 1) * gy + jnp.clip(iy, 0, gy - 1)
    rows = dist.reshape(gx * gy, gz)[lin]               # [..., gz]
    m = jnp.arange(gz, dtype=jnp.int32) == iz[..., None]
    val = jnp.sum(jnp.where(m, rows, 0.0), axis=-1)
    d = jnp.where(inside, val, cfg.infinity_distance)
    return jnp.where(in_map, d, UNDEFINED_DIST)


def _sample_costs_soa(cfg: FiestaConfig, mpc: MPCConfig, dist_grid,
                      p0, v0, goal, ctrl_soa):
    """MPPI sample costs [K] from controls [H,3,K] — trajectory_cost
    semantics, evaluated entirely in component layout."""
    pos = _rollout_positions_soa(mpc, p0, v0, ctrl_soa)    # [H,3,K]
    if mpc.sample_query == "trilinear":
        d, _ = get_dist_grad_trilinear(
            cfg, dist_grid, jnp.moveaxis(pos, 1, -1),
            out_value=-cfg.trunc_dist if mpc.signed else -1.0)  # [H,K]
    else:
        d = _nearest_distance_soa(cfg, dist_grid,
                                  pos[:, 0], pos[:, 1], pos[:, 2])
    if mpc.signed:
        d = jnp.maximum(d, -cfg.trunc_dist)
    else:
        d = jnp.where(d < 0, 0.0, d)
    violation = jnp.maximum(mpc.margin - d, 0.0)           # [H,K]
    collision = jnp.sum(violation**2, axis=0)              # [K]

    ge = pos - goal[None, :, None]                         # [H,3,K]
    goal_cost = (jnp.sum(ge[:-1] ** 2, axis=(0, 1))
                 * mpc.w_goal / max(mpc.horizon, 1))
    terminal = jnp.sum(ge[-1] ** 2, axis=0) * mpc.w_terminal
    effort = jnp.sum(ctrl_soa**2, axis=(0, 1)) * mpc.w_effort
    return mpc.w_collision * collision + goal_cost + terminal + effort


def trajectory_cost(
    cfg: FiestaConfig, mpc: MPCConfig, dist_grid, positions, controls, goal,
    trilinear: bool = True,
):
    """Collision + goal + effort cost of one trajectory ([H,3] inputs)."""
    out_value = -cfg.trunc_dist if mpc.signed else -1.0
    if trilinear:
        d, _ = get_dist_grad_trilinear(cfg, dist_grid, positions,
                                       out_value=out_value)
    else:
        d = get_distance(cfg, dist_grid, positions)
    if mpc.signed:
        # interior/out-of-map read as graded penetration depth, floored at
        # the truncation (also maps get_distance's -10000 sentinel there)
        d = jnp.maximum(d, -cfg.trunc_dist)
    else:
        # out-of-map queries return negative sentinels: treat as fully
        # colliding
        d = jnp.where(d < 0, 0.0, d)
    violation = jnp.maximum(mpc.margin - d, 0.0)
    collision = jnp.sum(violation**2)

    goal_err = positions - goal
    goal_cost = jnp.sum(goal_err[:-1] ** 2) * mpc.w_goal / max(mpc.horizon, 1)
    terminal = jnp.sum(goal_err[-1] ** 2) * mpc.w_terminal
    effort = jnp.sum(controls**2) * mpc.w_effort
    return mpc.w_collision * collision + goal_cost + terminal + effort


def _plan_step_impl(
    cfg: FiestaConfig,
    mpc: MPCConfig,
    dist_grid: jax.Array,
    p0: jax.Array,
    v0: jax.Array,
    goal: jax.Array,
    nominal: jax.Array,
    key: jax.Array,
    constrain=None,
) -> PlanResult:
    """One MPC solve: MPPI sampling + ESDF-gradient refinement.

    Args:
      dist_grid: [X,Y,Z] metric distances (``query.distance_grid``).
      p0, v0, goal: [3] current position/velocity and goal position.
      nominal: [H,3] warm-start control sequence (previous plan shifted).
      key: PRNG key.
      constrain: optional fn applying a sharding constraint to the
        rollout-batched arrays (scenario parallelism; see
        ``make_sharded_planner``).
    """
    h = mpc.horizon

    # ---- MPPI sampling (component layout: K rides the lane axis) --------
    noise = (
        jax.random.normal(key, (h, 3, mpc.n_rollouts), jnp.float32)
        * mpc.sigma
    )
    if constrain is not None:
        noise = constrain(noise)
    samples = jnp.clip(nominal[:, :, None] + noise, -mpc.a_max, mpc.a_max)
    if constrain is not None:
        samples = constrain(samples)

    costs = _sample_costs_soa(cfg, mpc, dist_grid, p0, v0, goal,
                              samples)                      # [K]

    beta = jnp.min(costs)
    w = jax.nn.softmax(-(costs - beta) / mpc.temperature)   # [K]
    mppi_ctrl = jnp.einsum("hck,k->hc", samples, w)
    mppi_ctrl = jnp.clip(mppi_ctrl, -mpc.a_max, mpc.a_max)

    # ---- ESDF-gradient refinement (Adam on the control sequence) ---------
    def refine_cost(ctrl):
        pos = rollout_positions(mpc, p0, v0, ctrl)
        return trajectory_cost(cfg, mpc, dist_grid, pos, ctrl, goal)

    grad_fn = jax.value_and_grad(refine_cost)

    def adam_step(carry, _):
        ctrl, m, v, t = carry
        c, g = grad_fn(ctrl)
        t = t + 1
        m = 0.9 * m + 0.1 * g
        v = 0.999 * v + 0.001 * g * g
        mhat = m / (1 - 0.9**t)
        vhat = v / (1 - 0.999**t)
        ctrl = jnp.clip(
            ctrl - mpc.refine_lr * mhat / (jnp.sqrt(vhat) + 1e-8),
            -mpc.a_max, mpc.a_max,
        )
        return (ctrl, m, v, t), c

    (refined, _, _, _), _ = jax.lax.scan(
        adam_step,
        (mppi_ctrl, jnp.zeros_like(mppi_ctrl), jnp.zeros_like(mppi_ctrl),
         jnp.float32(0.0)),
        None,
        length=mpc.refine_steps,
    )

    final_pos = rollout_positions(mpc, p0, v0, refined)
    final_cost = trajectory_cost(cfg, mpc, dist_grid, final_pos, refined, goal)

    return PlanResult(
        controls=refined,
        positions=final_pos,
        cost=final_cost,
        best_sample_cost=beta,
        mean_sample_cost=jnp.mean(costs),
    )


@partial(jax.jit, static_argnames=("cfg", "mpc"))
def plan_step(
    cfg: FiestaConfig,
    mpc: MPCConfig,
    dist_grid: jax.Array,
    p0: jax.Array,
    v0: jax.Array,
    goal: jax.Array,
    nominal: jax.Array,
    key: jax.Array,
) -> PlanResult:
    """Single-device MPC solve (see ``_plan_step_impl``)."""
    return _plan_step_impl(cfg, mpc, dist_grid, p0, v0, goal, nominal, key)


def shift_nominal(controls: jax.Array) -> jax.Array:
    """Receding-horizon warm start: drop the executed step, repeat the last."""
    return jnp.concatenate([controls[1:], controls[-1:]], axis=0)


def make_sharded_planner(cfg: FiestaConfig, mpc: MPCConfig, mesh):
    """Shard MPPI rollouts over a device mesh (scenario parallelism).

    The K rollouts are embarrassingly parallel; only the softmax
    normalization and the weighted control update reduce across devices —
    two small psums over ICI (SURVEY.md section 5: batch-sharded rollouts
    need no cross-device traffic except the final reduction).
    Returns a jitted fn with the same signature as ``plan_step`` minus
    (cfg, mpc).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    axis = mesh.axis_names[0]
    replicated = NamedSharding(mesh, P())
    if mpc.n_rollouts % mesh.shape[axis]:
        raise ValueError(
            f"n_rollouts={mpc.n_rollouts} must divide by the size of mesh "
            f"axis {axis!r} ({mesh.shape[axis]}) that shards the rollouts")

    def constrain(x):
        # rollout-batched arrays split on K (the LAST axis in the
        # component layout); GSPMD turns the softmax normalization and
        # the weighted control einsum into psums
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P(*([None] * (x.ndim - 1)), axis)))

    def sharded(dist_grid, p0, v0, goal, nominal, key):
        dist_grid = jax.lax.with_sharding_constraint(dist_grid, replicated)
        return _plan_step_impl(cfg, mpc, dist_grid, p0, v0, goal, nominal,
                               key, constrain=constrain)

    return jax.jit(sharded)
