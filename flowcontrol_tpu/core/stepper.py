"""Jitted time-stepping engine: the TPU-native hot loop.

Replaces the reference's per-step assemble + MUMPS back-substitution
(ref: src/flowcontrol/flowsolver.py:703-799) with a single fused XLA step:

    rhs  = mass/operator element-tensor applies on (u_n, u_nn)   [MXU]
         + nonlinear convection quadrature kernel                 [MXU]
         + actuation (precomputed force columns / BC lifting)     [rank-1]
    x    = LU back-substitution with device-resident factors
    y    = C @ x  (sensor rows),  dE = ½ xᵀM x,  divergence flag

Whole rollouts run under ``lax.scan`` (optionally chunked for checkpoint
I/O), and ``vmap`` over initial conditions / controller parameters turns the
engine into a batched rollout machine (BASELINE.json north star).

Time-scheme order ramp (BDF1 first step → BDF2 after; ref:
flowsolver.py:740-743) is handled with ``lax.cond`` over two factor sets.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from flowcontrol_tpu.fem.assembly import (
    apply_element_tensors,
    geometry_device_tables,
    nonlinear_convection,
    to_scipy_csr,
)
from flowcontrol_tpu.fem.bc import BCSet
from flowcontrol_tpu.solvers.direct import HostDenseLUOnDevice, HostSparseLU, dense_lu_solve


class StepCarry(NamedTuple):
    """Scan carry: history fields + AB2 cache + iteration counter."""

    u_n: jnp.ndarray  # mixed state at step k (n,)
    u_nn: jnp.ndarray  # mixed state at step k-1 (n,)
    n_prev: jnp.ndarray  # N(u_nn) cached from previous step (n,)
    u_ctrl_prev: jnp.ndarray  # previous control (CN body-force averaging)
    it: jnp.ndarray  # iteration counter (int32)


class StepOutput(NamedTuple):
    y: jnp.ndarray  # sensor measurements (ns,)
    dE: jnp.ndarray  # perturbation kinetic energy
    diverged: jnp.ndarray  # bool
    x: jnp.ndarray  # full state (only captured when requested)


@dataclass
class Stepper:
    """Device-resident stepping engine for one linearized-around-U0 problem."""

    space: Any
    forms: Any  # NSForms
    bcs: BCSet  # perturbation-field BCs (+ optional pressure pin)
    u0_nodes: np.ndarray  # base-flow velocity (n_vnodes, 2)
    c_rows: np.ndarray  # (ns, n) sensor matrix
    force_cols: np.ndarray  # (n_act, n) body-force load vectors
    scheme: str = "bdf"  # 'bdf' or 'cn'
    backend: str = "dense_lu"  # 'dense_lu' | 'host_lu'
    dtype: Any = np.float64
    start_order: Any = 1  # 1 or 2 or 'cn' (restart_order)

    def __post_init__(self):
        forms, space, bcs = self.forms, self.space, self.bcs
        n = space.n_dofs
        dt = self.dtype
        u0 = self.u0_nodes
        self.n_act = self.force_cols.shape[0]
        self.ns = self.c_rows.shape[0]

        orders = ("cn",) if self.scheme == "cn" else (1, 2)
        self._orders = orders
        self._solvers = {}
        self._lift_act = {}
        self._lift_static = {}
        self._host_lus = {}
        profiles = bcs.g_profiles()[:, bcs.dofs] if self.n_act else np.zeros((0, len(bcs.dofs)))
        for order in orders:
            lhs_e = forms.transient_lhs(order, u0)
            a_csr = to_scipy_csr(lhs_e, space.cell_dofs, n)
            a_bc, lift_cols = bcs.eliminate_csr(a_csr)
            la = (
                (lift_cols @ profiles.T).T
                if self.n_act
                else np.zeros((0, n))
            )
            self._lift_act[order] = jnp.asarray(la, dtype=dt)
            self._lift_static[order] = jnp.asarray(lift_cols @ bcs.values, dtype=dt)
            if self.backend == "dense_lu":
                self._solvers[order] = HostDenseLUOnDevice(
                    np.asarray(a_bc.todense()), device_dtype=dt
                ).tree()
            else:
                self._host_lus[order] = HostSparseLU(a_bc)

        # device tables
        self._geom_dev = geometry_device_tables(forms.geom, dtype=dt)
        self._m_e = jnp.asarray(forms.mass_elements(), dtype=dt)
        self._cell_dofs = jnp.asarray(space.cell_dofs)
        if self.scheme == "cn":
            self._lvel_e = jnp.asarray(
                forms.velocity_operator_elements(u0, include_shift=False), dtype=dt
            )
        else:
            self._lvel_e = None
        self._c_dev = jnp.asarray(self.c_rows, dtype=dt)
        self._f_dev = jnp.asarray(self.force_cols, dtype=dt)
        self._bc_dofs = jnp.asarray(bcs.dofs)
        self._bc_values = jnp.asarray(bcs.values, dtype=dt)
        self._bc_profiles = jnp.asarray(profiles, dtype=dt)
        self._coeffs = {o: forms.rhs_coefficients(o) for o in orders}
        self._is_nonlinear = forms.is_nonlinear
        self._scan_step = None

    # ── Pure step math (traceable) ───────────────────────────────────────────

    def _apply(self, a_e, x):
        return apply_element_tensors(a_e, self._cell_dofs, x, self.space.n_dofs)

    def _nl(self, x):
        if not self._is_nonlinear:
            return jnp.zeros_like(x)
        return nonlinear_convection(self._geom_dev, self.space, x)

    def _rhs(self, order, carry: StepCarry, u_ctrl, nl_n):
        c = self._coeffs[order]
        rhs = c["c_mn"] * self._apply(self._m_e, carry.u_n)
        if c["c_mnn"]:
            rhs = rhs + c["c_mnn"] * self._apply(self._m_e, carry.u_nn)
        if c["c_nl_n"]:
            rhs = rhs + c["c_nl_n"] * nl_n
        if c["c_nl_nn"]:
            rhs = rhs + c["c_nl_nn"] * carry.n_prev
        if c["c_lvel"]:
            rhs = rhs + c["c_lvel"] * self._apply(self._lvel_e, carry.u_n)
        if self.n_act:
            f_amp = c["c_f"] * u_ctrl + c["c_fn"] * carry.u_ctrl_prev
            rhs = rhs + f_amp @ self._f_dev
            rhs = rhs - u_ctrl @ self._lift_act[order]
        rhs = rhs - self._lift_static[order]
        g = self._bc_values
        if self.n_act:
            g = g + u_ctrl @ self._bc_profiles
        return rhs.at[self._bc_dofs].set(g)

    def _solve(self, order, rhs):
        if self.backend == "dense_lu":
            return dense_lu_solve(self._solvers[order], rhs)
        # host fallback through pure_callback (f64, CPU) — validation path
        lu = self._host_lus[order]

        def cb(b):
            return lu.solve(np.asarray(b, dtype=np.float64)).astype(b.dtype)

        return jax.pure_callback(
            cb, jax.ShapeDtypeStruct(rhs.shape, rhs.dtype), rhs
        )

    def _step_order(self, order, carry: StepCarry, u_ctrl):
        nl_n = self._nl(carry.u_n)
        rhs = self._rhs(order, carry, u_ctrl, nl_n)
        x = self._solve(order, rhs)
        return x, nl_n

    def step_fn(self) -> Callable:
        """(carry, u_ctrl) -> (carry', StepOutput), for lax.scan / jit."""

        def step(carry: StepCarry, u_ctrl):
            u_ctrl = jnp.asarray(u_ctrl, dtype=self.dtype).reshape(self.n_act)
            if self.scheme == "cn":
                x, nl_n = self._step_order("cn", carry, u_ctrl)
            elif self.start_order == 2:
                x, nl_n = self._step_order(2, carry, u_ctrl)
            else:
                # BDF1 on the very first step, BDF2 afterwards
                def o1(c):
                    return self._step_order(1, c, u_ctrl)

                def o2(c):
                    return self._step_order(2, c, u_ctrl)

                x, nl_n = jax.lax.cond(carry.it == 0, o1, o2, carry)
            y = self._c_dev @ x
            de = 0.5 * jnp.dot(x, self._apply(self._m_e, x))
            diverged = ~jnp.all(jnp.isfinite(x))
            new_carry = StepCarry(
                u_n=x,
                u_nn=carry.u_n,
                n_prev=nl_n,
                u_ctrl_prev=u_ctrl,
                it=carry.it + 1,
            )
            return new_carry, StepOutput(y=y, dE=de, diverged=diverged, x=x)

        return step

    # ── Public API ───────────────────────────────────────────────────────────

    def init_carry(self, up0: np.ndarray, up_prev: np.ndarray | None = None) -> StepCarry:
        """Carry from an initial mixed state (and optional previous state for
        BDF2 restarts — ref: flowsolver.py:599-663)."""
        u0 = jnp.asarray(up0, dtype=self.dtype)
        um1 = u0 if up_prev is None else jnp.asarray(up_prev, dtype=self.dtype)
        nprev = self._nl(um1) if self._is_nonlinear else jnp.zeros_like(u0)
        return StepCarry(
            u_n=u0,
            u_nn=um1,
            n_prev=nprev,
            u_ctrl_prev=jnp.zeros(self.n_act, dtype=self.dtype),
            it=jnp.asarray(0, dtype=jnp.int32),
        )

    def compiled_step(self):
        if self._scan_step is None:
            self._scan_step = jax.jit(self.step_fn())
        return self._scan_step

    def rollout_open_loop(self, carry: StepCarry, u_seq):
        """Scan num_steps with a prescribed control sequence (T, n_act)."""
        step = self.step_fn()
        u_seq = jnp.asarray(u_seq, dtype=self.dtype)
        return jax.lax.scan(step, carry, u_seq)

    def rollout_closed_loop(self, carry: StepCarry, k_mats, y0, num_steps: int,
                            feedback_sign: float = -1.0):
        """Fused plant+controller rollout.

        ``k_mats`` = (Ad, Bd, Cd, Dd) discrete controller matrices. At each
        step: u = Cd xk + Dd (sign·y); xk' = Ad xk + Bd (sign·y) — matching
        the reference's lockstep loop (ref: run_cylinder_example.py:83-86).
        """
        ad, bd, cd, dd = (jnp.asarray(m, dtype=self.dtype) for m in k_mats)
        step = self.step_fn()

        def fused(carry_all, _):
            carry, xk, y = carry_all
            ys = feedback_sign * y
            u = cd @ xk + dd @ ys
            xk_new = ad @ xk + bd @ ys
            carry, out = step(carry, u)
            return (carry, xk_new, out.y), (out.y, out.dE, u, out.diverged)

        xk0 = jnp.zeros(ad.shape[0], dtype=self.dtype)
        y0 = jnp.asarray(y0, dtype=self.dtype)
        (carry, xk, _), outs = jax.lax.scan(
            fused, (carry, xk0, y0), None, length=num_steps
        )
        return carry, outs
