"""Synthesize an LQG feedback controller for the open cavity at Re=7500 on
the reference's 235k-dof stock mesh, and commit the artifacts a test/example
can replay cheaply.

This closes the loop the reference DEFINES but never closes: its cavity
case ships the wall-shear feedback sensor + upstream Gaussian volume-force
actuator pair (ref: src/examples/cavity/cavityflowsolver.py:254-268), yet
its own example runs open-loop (ref: run_cavity_example.py:73-75). Pipeline
(the same first-party stack proven on the pinball in round 4,
tools/pinball_mimo_synth.py):

  committed 235k base flow        (models/_baseflows/cavity_re7500_*.npz)
  -> A, E, B, C export            (core/operatorgetter.py)
  -> Petrov-Galerkin modal ROM    (utils/linalg.modal_rom) around the 4
     unstable pairs 0.889+10.899j, 0.727+13.800j, 0.461+7.881j,
     0.0318+16.726j (ref: compute_eigenvalues.py:53-57)
  -> LQG regulator on the ROM     (utils/lticontrol.lqg_regulator)
  -> controller .mat artifact     (utils/lticontrol.export_controller)

Artifacts written into flowcontrol_tpu/models/_controllers/:
  cavity_rom_re7500.npz   (ROM A, B, C + kept eigenvalues)
  cavity_lqg_re7500.mat   (A, B, C, D)

Usage: python tools/cavity_feedback_synth.py  [hours on one CPU core; the
235k complex shift-invert factorizations dominate — 8 splu(A - sigma E)]
"""
import logging
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")  # host-only tool

from flowcontrol_tpu.core.operatorgetter import OperatorGetter
from flowcontrol_tpu.models.cavity import CavityFlowSolver
from flowcontrol_tpu.utils.linalg import modal_rom
from flowcontrol_tpu.utils.lticontrol import export_controller, lqg_regulator
from flowcontrol_tpu.utils.statespace import StateSpace

logging.basicConfig(level=logging.INFO)
log = logging.getLogger("cavity_feedback_synth")

RE = 7500.0
STOCK = Path("/root/reference/src/examples/cavity/data_input/cavity_coarse.xdmf")
PKG = Path(__file__).resolve().parents[1] / "flowcontrol_tpu" / "models"

t0 = time.time()
fs = CavityFlowSolver.make_default(
    Re=RE, meshpath=STOCK, num_steps=10, save_every=0,
    path_out=Path("/tmp/cavity_synth"), verbose=10,
    solver_backend="host_lu", precision="f64",
)
n = fs.space.n_dofs
log.info("stock cavity: %d dofs (%.0fs)", n, time.time() - t0)

base = PKG / "_baseflows" / f"cavity_re{RE:g}_n{n}.npz"
d = np.load(base)
fs._assign_steady_state(d["U0"], d["P0"])
log.info("loaded committed base flow %s", base.name)

rom_cache = PKG / "_controllers" / f"cavity_rom_re{RE:g}.npz"
mode_cache = PKG / "_controllers" / f"cavity_mode_re{RE:g}.npz"
a = e = None


def _operators():
    global a, e
    if a is None:
        t1 = time.time()
        og = OperatorGetter(fs)
        a_, e_, b, c = og.get_all(autodiff=False, u_ctrl=[0.0])
        a, e = a_, e_
        b = np.atleast_2d(np.asarray(b))
        if b.shape[0] != n:
            b = b.T
        c = np.atleast_2d(np.asarray(c))
        log.info("operators: A %s nnz %d, B %s, C %s (%.0fs)",
                 a.shape, a.nnz, b.shape, c.shape, time.time() - t1)
        _operators.bc = (b, c)
    return a, e, *_operators.bc


if rom_cache.exists():
    dd = np.load(rom_cache)
    rom = StateSpace(dd["A"], dd["B"], dd["C"])
    kept = dd["kept"]
    log.info("loaded cached ROM %s", rom_cache.name)
else:
    a, e, b, c = _operators()
    # Shifts bracket the four documented unstable pairs PLUS the next
    # branch members above: the first deployed design excited an
    # unmodeled weakly-stable mode at omega ~ 19.6 into a growth-rate-7.9
    # closed-loop instability on the full plant (measured round 5 —
    # classic observation spillover at the first out-of-band mode), so
    # the ROM must extend past the loop's active band.
    t2 = time.time()
    rom, kept = modal_rom(
        a, e, b, c,
        shifts=[0.6 + 8.0j, 0.8 + 11.0j, 0.7 + 13.8j, 0.1 + 16.7j,
                0.0 + 19.6j, 0.0 + 22.5j],
        k_per_shift=4, re_min=-2.0,
    )
    rom_cache.parent.mkdir(exist_ok=True)
    np.savez_compressed(rom_cache, A=np.asarray(rom.A), B=np.asarray(rom.B),
                        C=np.asarray(rom.C), kept=np.asarray(kept))
    log.info("ROM built (%.0fs)", time.time() - t2)

if not mode_cache.exists():
    # Leading unstable eigenmode shape (mixed up vector, f32): the
    # disturbance-rejection demos/tests initialize WITH this mode so the
    # closed-vs-open energy comparison measures the unstable subspace the
    # controller targets, not the stable transient a generic Gaussian
    # bump mostly excites (its growth/decay contrast at a 400-step
    # horizon was measured unobservable — round 5).
    from flowcontrol_tpu.utils.linalg import get_mat_vp_shift_invert

    a, e, _, _ = _operators()
    t3 = time.time()
    vals, vecs = get_mat_vp_shift_invert(a, e, n=2, sigma=0.85 + 10.9j)
    i0 = int(np.argmax(vals.real))
    v = vecs[:, i0]
    v = v / np.linalg.norm(v)
    np.savez_compressed(
        mode_cache, eig=np.complex128(vals[i0]),
        v_re=np.asarray(v.real, dtype=np.float32),
        v_im=np.asarray(v.imag, dtype=np.float32),
    )
    log.info("leading mode %.4f%+.4fj exported -> %s (%.0fs)",
             vals[i0].real, vals[i0].imag, mode_cache.name,
             time.time() - t3)

Ai, Bi, Cr = np.asarray(rom.A), np.asarray(rom.B), np.asarray(rom.C)
rom_eigs = np.linalg.eigvals(Ai)
log.info("ROM order %d; kept eigs %s; unstable %d", Ai.shape[0],
         np.round(np.sort_complex(kept), 4),
         int((rom_eigs.real > 0).sum()))


# ── sampled-data LQG (utils.lticontrol.dlqg_regulator) ──────────────────────
# Designed in DISCRETE time at the flow's dt so the sampled loop is stable
# by construction, with the state weights focused on the unstable subspace
# (flat weights make the LQR kick the well-controllable stable modes with
# a transient orders of magnitude above the unstable content — measured on
# the ROM, round 5). Weights calibrated by minimizing the closed/open
# energy-crossing step count from an unstable-mode IC.
from scipy.linalg import expm

from flowcontrol_tpu.utils.lticontrol import dlqg_regulator

DT = 4e-4  # the cavity production dt (ref: cavityflowsolver.py:254-268)
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
Q = np.diag(sel + 0.01 * (1 - sel)) + 1e-9 * np.eye(nx)
Qw = np.diag(sel) + 1e-9 * np.eye(nx)
# LOW-GAIN point (ru=100, rv=1e5): peak discrete compensator gain
# 0.081 vs ~8 at the (1, 100) design — LQG has no guaranteed margins
# and the cavity's modeled band is embedded in a dense cloud of
# weakly-damped unmodeled modes; the first two higher-gain deployments
# measured closed-loop instabilities at growth ~+8/t.u. on the 235k
# plant. ROM crossing moves 1500 -> ~2860 steps, a price the tests pay.
klqg, F, L = dlqg_regulator(rom, DT, ru=100.0, rv=1e5, Q=Q, Qw=Qw)

# certify the exact sampled interconnection and report the closed/open
# energy trajectory from the leading-mode IC (what the rejection test pins)
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
for i in range(1, 4001):
    z = M @ z
    zo = Adp @ zo
    if i in (1000, 2000, 3000, 4000):
        log.info("ROM closed/open energy at N=%d: %.3f", i,
                 np.sum(z[:nx] ** 2) / np.sum(zo ** 2))

out = PKG / "_controllers" / f"cavity_lqg_re{RE:g}.mat"
export_controller(out, klqg, dt=DT)
log.info("controller exported: %s (%d states, %d inputs, %d outputs, "
         "discrete dt=%g, sampled spectral radius %.5f)",
         out, np.asarray(klqg.A).shape[0], np.asarray(klqg.B).shape[1],
         np.asarray(klqg.C).shape[0], DT, sr)
print(f"DONE rom={Ai.shape[0]} states sampled_sr={sr:.5f} "
      f"open_max_re={rom_eigs.real.max():.4f}")
