"""Synthesize a MIMO LQG feedback controller for the stock fluidic pinball
(3 rotation actuators x 3 downstream V-sensors) with the framework's own
toolbox, and commit the artifacts a test/example can replay cheaply.

The reference ships a pinball controller artifact it never exercises in
code (ref: src/examples/pinball/data_input/Kdx8dy0p0.mat — 10-state SISO);
this tool produces the genuinely MIMO equivalent end-to-end:

  steady state (stock mesh, ref: pinballflowsolver.py:237-320 defaults)
  -> A, E, B, C export            (core/operatorgetter.py)
  -> shift-invert Arnoldi modes   (utils/linalg.py, host ARPACK)
  -> Petrov-Galerkin modal ROM    (adjoint-mode test basis)
  -> LQG regulator on the ROM     (utils/lticontrol.lqg_regulator)
  -> controller .mat artifact     (utils/lticontrol.export_controller)

Artifacts written into flowcontrol_tpu/models/:
  _baseflows/pinball_re{RE}_n{n}.npz   (U0, P0)
  _controllers/pinball_lqg_re{RE}.mat  (A, B, C, D)

Usage: python tools/pinball_mimo_synth.py  [~45-90 min on one CPU core;
the steady Newton chain and the 300k-dof complex splu dominate]
"""
import logging
import sys
import time
from pathlib import Path

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")  # host-only tool

from flowcontrol_tpu.core.actuator import CYLINDER_ACTUATION_MODE
from flowcontrol_tpu.core.operatorgetter import OperatorGetter
from flowcontrol_tpu.models.pinball import PinballFlowSolver
from flowcontrol_tpu.utils.linalg import get_mat_vp_shift_invert
from flowcontrol_tpu.utils.lticontrol import export_controller, lqg_regulator
from flowcontrol_tpu.utils.statespace import StateSpace

logging.basicConfig(level=logging.INFO)
log = logging.getLogger("pinball_mimo_synth")

RE = float(sys.argv[1]) if len(sys.argv) > 1 else 30.0
STOCK = Path("/root/reference/src/examples/pinball/data_input/mesh_middle_gmsh.xdmf")
PKG = Path(__file__).resolve().parents[1] / "flowcontrol_tpu" / "models"

t0 = time.time()
fs = PinballFlowSolver.make_default(
    Re=RE, meshpath=STOCK, num_steps=10, save_every=0,
    path_out=Path("/tmp/pinball_synth"), verbose=10,
    mode_actuation=CYLINDER_ACTUATION_MODE.ROTATION,
    solver_backend="host_lu", precision="f64",
)
n = fs.space.n_dofs
log.info("stock pinball: %d dofs (%.0fs)", n, time.time() - t0)

u0_ctrl = [0.0, 0.0, 0.0]
base = PKG / "_baseflows" / f"pinball_re{RE:g}_n{n}.npz"
if base.exists():
    d = np.load(base)
    fs._assign_steady_state(d["U0"], d["P0"])
    log.info("loaded committed base flow %s", base.name)
else:
    # Continuation in Re (the reference's own lidcavity workflow pattern,
    # ref: compute_steady_state_increasing_Re.py): seed Newton at each
    # stage with the converged solution of the previous Re. Start from the
    # highest committed base flow below the target; cold-start with
    # Picard+Newton when none exists.
    committed = sorted(
        (float(p.stem.split("_re")[1].split("_n")[0]), p)
        for p in (PKG / "_baseflows").glob(f"pinball_re*_n{n}.npz")
        if float(p.stem.split("_re")[1].split("_n")[0]) < RE
    )
    if committed:
        re_lo, p_lo = committed[-1]
        d = np.load(p_lo)
        fs._assign_steady_state(d["U0"], d["P0"])
        guess = np.asarray(fs.fields.UP0)
        log.info("continuation seed: %s (Re=%g)", p_lo.name, re_lo)
    else:
        re_lo = min(30.0, RE)
        fs0 = fs if re_lo == RE else PinballFlowSolver.make_default(
            Re=re_lo, meshpath=STOCK, num_steps=10, save_every=0,
            path_out=Path("/tmp/pinball_synth"), verbose=10,
            mode_actuation=CYLINDER_ACTUATION_MODE.ROTATION,
            solver_backend="host_lu", precision="f64",
        )
        fs0.compute_steady_state(method="picard", max_iter=15, tol=1e-7,
                                 u_ctrl=u0_ctrl)
        fs0.compute_steady_state(method="newton", max_iter=10,
                                 u_ctrl=u0_ctrl,
                                 initial_guess=fs0.fields.UP0)
        guess = np.asarray(fs0.fields.UP0)
        log.info("cold start at Re=%g done (%.0fs)", re_lo, time.time() - t0)
    schedule = [r for r in (50.0, 70.0, 85.0, 100.0, RE)
                if re_lo < r <= RE]
    schedule = sorted(set(schedule))
    for re_i in schedule:
        t_st = time.time()
        fs_i = fs if re_i == RE else PinballFlowSolver.make_default(
            Re=re_i, meshpath=STOCK, num_steps=10, save_every=0,
            path_out=Path("/tmp/pinball_synth"), verbose=10,
            mode_actuation=CYLINDER_ACTUATION_MODE.ROTATION,
            solver_backend="host_lu", precision="f64",
        )
        fs_i.compute_steady_state(method="newton", max_iter=12,
                                  u_ctrl=u0_ctrl, initial_guess=guess)
        guess = np.asarray(fs_i.fields.UP0)
        log.info("continuation Re=%g converged (%.0fs)", re_i,
                 time.time() - t_st)
    if not schedule:  # RE == re_lo cold start
        fs._assign_steady_state(fs0.fields.U0, fs0.fields.P0)
    base.parent.mkdir(exist_ok=True)
    np.savez_compressed(base, U0=fs.fields.U0, P0=fs.fields.P0)
    log.info("steady state done + cached (%.0fs)", time.time() - t0)

t1 = time.time()
og = OperatorGetter(fs)
a, e, b, c = og.get_all(autodiff=True, u_ctrl=[0.0, 0.0, 0.0])
b = np.atleast_2d(np.asarray(b))  # (n, n_act) columns
assert b.shape[0] == n, b.shape
c = np.atleast_2d(np.asarray(c))  # (ns, n) rows
log.info("operators: A %s nnz %d, B %s, C %s (%.0fs)",
         a.shape, a.nnz, b.shape, c.shape, time.time() - t1)

# ── dominant modes -> real modal ROM (utils/linalg.modal_rom) ────────────────
# The pinball's least-damped modes at low Re sit near the vortex-shedding
# frequency St~0.1-0.2 (omega ~ 0.6-1.2 at D=1, U=1). Two shifts bracket
# the branch; modal_rom pairs each right mode with its adjoint (left)
# mode, scales w^H E v = 1, and realifies into a block-diagonal ROM.
t2 = time.time()
from flowcontrol_tpu.utils.linalg import modal_rom
from flowcontrol_tpu.utils.statespace import StateSpace as _SS

rom_cache = PKG / "_controllers" / f"pinball_rom_re{RE:g}.npz"
if rom_cache.exists():
    dd = np.load(rom_cache)
    rom = _SS(dd["A"], dd["B"], dd["C"])
    kept = dd["kept"]
    log.info("loaded cached ROM %s", rom_cache.name)
else:
    # At Re=100 the pinball carries multiple unstable modes (ref README:58
    # "Re<=100"): the vortex-shedding branch near omega~0.7-1.2 plus the
    # steady symmetry-breaking mode near the origin — add a second
    # oscillatory shift above Re 80 so every unstable pair is captured.
    shifts = [0.0 + 0.75j, 0.0 + 0.0j]
    if RE >= 80.0:
        shifts = [0.0 + 0.75j, 0.1 + 1.1j, 0.0 + 0.0j]
    rom, kept = modal_rom(
        a, e, b, c, shifts=shifts, k_per_shift=6, re_min=-1.0,
    )
    rom_cache.parent.mkdir(exist_ok=True)
    np.savez_compressed(rom_cache, A=np.asarray(rom.A), B=np.asarray(rom.B),
                        C=np.asarray(rom.C), kept=np.asarray(kept))
Ai = np.asarray(rom.A)
Bi = np.asarray(rom.B)
Cr = np.asarray(rom.C)
rom_eigs = np.linalg.eigvals(Ai)
log.info("ROM order %d (%.0fs); kept eigs %s", Ai.shape[0],
         time.time() - t2, np.round(np.sort_complex(kept), 4))

mode_cache = PKG / "_controllers" / f"pinball_mode_re{RE:g}.npz"
if not mode_cache.exists():
    # Leading unstable eigenmode shape (see cavity_feedback_synth.py:
    # rejection demos/tests initialize with it so the closed-vs-open
    # energy contrast measures the controlled subspace)
    from flowcontrol_tpu.utils.linalg import get_mat_vp_shift_invert

    t3 = time.time()
    best_v, best_l = None, None
    for sig in (0.05 + 0.55j, 0.05 + 0.0j):
        vals, vecs = get_mat_vp_shift_invert(a, e, n=2, sigma=sig)
        i0 = int(np.argmax(vals.real))
        if best_l is None or vals[i0].real > best_l.real:
            best_l, best_v = vals[i0], vecs[:, i0]
    v = best_v / np.linalg.norm(best_v)
    np.savez_compressed(
        mode_cache, eig=np.complex128(best_l),
        v_re=np.asarray(v.real, dtype=np.float32),
        v_im=np.asarray(v.imag, dtype=np.float32),
    )
    log.info("leading mode %.4f%+.4fj exported -> %s (%.0fs)",
             best_l.real, best_l.imag, mode_cache.name, time.time() - t3)

# ── sampled-data LQG (utils.lticontrol.dlqg_regulator) ──────────────────────
# Designed in DISCRETE time at the pinball production dt so the sampled
# loop is stable by construction — the continuous design's compensator
# carries fast unstable poles at Re=100 (max Re +51.6) whose per-loop ZOH
# interconnection has spectral radius > 1 (measured, round 5). State
# weights focus on the unstable subspace: flat weights make the LQR kick
# the well-controllable stable modes with a transient orders of magnitude
# above the unstable content. Weights calibrated by minimizing the
# closed/open energy-crossing step count from an unstable-mode IC
# (Re=30: ~5.8k steps; Re=100: ~17k steps — the pinball's unstable modes
# are weakly controllable from the rotation actuators, so the loop pays a
# spillover price upfront and wins asymptotically).
from scipy.linalg import expm

from flowcontrol_tpu.utils.lticontrol import dlqg_regulator

DT = 5e-3  # pinball production dt (ref: test_pinball.py:59-65)
nx = Ai.shape[0]
sel = np.zeros(nx)
off = 0
mode_off = {}
for lam in kept:
    wdt = 1 if abs(lam.imag) <= 1e-6 else 2
    mode_off[complex(lam)] = off
    if lam.real > 0:
        sel[off:off + wdt] = 1.0
    off += wdt
Q = np.diag(sel) + 1e-9 * np.eye(nx)
Qw = np.diag(sel) + 1e-9 * np.eye(nx)
RU = 100.0 if RE >= 80.0 else 1.0
klqg, F, L = dlqg_regulator(rom, DT, ru=RU, rv=1e-3, Q=Q, Qw=Qw)

Adp = expm(Ai * DT)
Bdp = np.linalg.solve(Ai, (Adp - np.eye(nx))) @ Bi
M = np.block([
    [Adp, Bdp @ np.asarray(klqg.C)],
    [np.asarray(klqg.B) @ Cr, np.asarray(klqg.A)],
])
sr = np.abs(np.linalg.eigvals(M)).max()
assert sr < 1.0, f"sampled closed loop unstable (spectral radius {sr})"
lam0 = kept[np.argmax(kept.real)]
x0 = np.zeros(nx)
x0[mode_off[complex(lam0)]] = 0.5
z = np.concatenate([x0, np.zeros(nx)])
zo = x0.copy()
n_rep = 20000 if RE >= 80.0 else 8000
for i in range(1, n_rep + 1):
    z = M @ z
    zo = Adp @ zo
    if i % (n_rep // 4) == 0:
        log.info("ROM closed/open energy at N=%d: %.4g", i,
                 np.sum(z[:nx] ** 2) / np.sum(zo ** 2))

out = PKG / "_controllers" / f"pinball_lqg_re{RE:g}.mat"
out.parent.mkdir(exist_ok=True)
export_controller(out, klqg, dt=DT)
log.info("controller exported: %s (%d states, %d inputs, %d outputs, "
         "discrete dt=%g, sampled spectral radius %.5f)",
         out, np.asarray(klqg.A).shape[0], np.asarray(klqg.B).shape[1],
         np.asarray(klqg.C).shape[0], DT, sr)
print(f"DONE re={RE:g} rom={Ai.shape[0]} states sampled_sr={sr:.5f} "
      f"open_max_re={rom_eigs.real.max():.4f}")
