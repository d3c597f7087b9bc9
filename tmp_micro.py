import os, sys, time, statistics
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax, jax.numpy as jnp
from foamtpu.apps.cases import make_cavity
from foamtpu.core.dimensions import dimTime, dimViscosity
from foamtpu.ops import fvc, fvm, slot as slot_mod, schemes as schemes_mod
from foamtpu.solvers import linear, piso

N = int(os.environ.get("PROF_N", "400"))
mesh, state, cfg = make_cavity(N, p_solver={
    "solver": "GAMG", "preconditioner": "polynomial",
    "tolerance": 1e-7, "relTol": 0.01, "maxIter": 1000})
dt = jnp.asarray(0.5 * (0.1 / N), mesh.v.dtype)
step = piso.make_step(mesh, cfg)
for _ in range(3):
    state, diag = step(state, dt)
float(jnp.sum(state["U"].data))

def fence(x):
    return float(jnp.sum(x)) if hasattr(x, "dtype") else None

def timeit(fn, *args, reps=20, trials=3):
    out = fn(*args)
    jax.tree_util.tree_map(fence, out)
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.tree_util.tree_map(fence, out)
        ts.append((time.perf_counter() - t0) / reps)
    return statistics.median(ts) * 1e3

U, p, phi = state["U"], state["p"], state["phi"]
phi_slot = slot_mod.SlotFace(*state["phi_slot"], bv=phi[mesh.n_internal_faces:])
rdt = 1.0 / dt
nu = jnp.asarray(cfg.nu, mesh.v.dtype)

rows = []
rows.append(("from_flat(phi)", timeit(jax.jit(lambda f: slot_mod.from_flat(mesh, f).sv), phi)))
rows.append(("to_flat(phi_slot)", timeit(jax.jit(lambda s: slot_mod.to_flat(mesh, slot_mod.SlotFace(s[0], s[1], phi[mesh.n_internal_faces:]))), (phi_slot.sv, phi_slot.fb))))

@jax.jit
def asm_div(Ud, sv, fb):
    ps = slot_mod.SlotFace(sv, fb, phi[mesh.n_internal_faces:])
    Uf = U.with_data(Ud)
    m = fvm.div(mesh, phi, Uf, phi_slot=ps)
    return m.diag, m.soff
rows.append(("fvm.div (slot)", timeit(asm_div, U.data, phi_slot.sv, phi_slot.fb)))

@jax.jit
def asm_lap(Ud):
    Uf = U.with_data(Ud)
    m = fvm.laplacian(mesh, nu, Uf, gamma_dims=dimViscosity)
    return m.diag, m.soff
rows.append(("fvm.laplacian (scalar)", timeit(asm_lap, U.data)))

@jax.jit
def asm_ddt(Ud):
    Uf = U.with_data(Ud)
    m = fvm.ddt(mesh, Uf, Ud, rdt)
    return m.diag, m.source
rows.append(("fvm.ddt", timeit(asm_ddt, U.data)))

@jax.jit
def asm_full(Ud, sv, fb):
    ps = slot_mod.SlotFace(sv, fb, phi[mesh.n_internal_faces:])
    Uf = U.with_data(Ud)
    w_slot = schemes_mod.weights_slot(mesh, ps, cfg.div_scheme, Uf)
    eqn = (fvm.ddt(mesh, Uf, Ud, rdt)
           + fvm.div(mesh, phi, Uf, phi_slot=ps, slot_weights=w_slot)
           - fvm.laplacian(mesh, nu, Uf, gamma_dims=dimViscosity))
    return eqn.diag, eqn.source, eqn.soff
rows.append(("full momentum assembly (slot phi)", timeit(asm_full, U.data, phi_slot.sv, phi_slot.fb)))

@jax.jit
def gradp(pd):
    return fvc.grad_of(mesh, p.with_data(pd), cfg.grad_scheme)
rows.append(("fvc.grad_of(p)", timeit(gradp, p.data)))

@jax.jit
def fluxof(Ud):
    f = slot_mod.flux_of(mesh, Ud)
    return f.sv, f.fb
rows.append(("slot.flux_of(U)", timeit(fluxof, U.data)))

@jax.jit
def solve_mom(Ud, sv, fb):
    ps = slot_mod.SlotFace(sv, fb, phi[mesh.n_internal_faces:])
    Uf = U.with_data(Ud)
    eqn = (fvm.ddt(mesh, Uf, Ud, rdt)
           + fvm.div(mesh, phi, Uf, phi_slot=ps)
           - fvm.laplacian(mesh, nu, Uf, gamma_dims=dimViscosity))
    gp = fvc.grad_of(mesh, p, cfg.grad_scheme)
    eqn = eqn.add_source(-gp, mesh)
    x, perf = linear.solve(mesh, eqn, Ud, cfg.u_controls or {
        "solver": "PBiCGStab", "tolerance": 1e-5, "relTol": 0.1,
        "maxIter": 300})
    return x, perf.n_iterations
x, nit = solve_mom(U.data, phi_slot.sv, phi_slot.fb)
rows.append((f"momentum asm+solve ({int(nit)} it)", timeit(lambda: solve_mom(U.data, phi_slot.sv, phi_slot.fb)[0])))

rows.append(("full PISO step", timeit(lambda: step(state, dt)[0]["U"].data)))

print(f"\n# micro breakdown — cavity {N}x{N} ({mesh.n_cells} cells)")
for name, ms in rows:
    print(f"{name:44s} {ms:9.3f} ms")
