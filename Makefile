# Developer entry points. CPU targets bypass the axon TPU registration
# (see CLAUDE.md); TPU targets use the default environment.

CPU_ENV := PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu

.PHONY: test bench train evaluate dryrun pallas-ab dispersion ref-recipe \
	excited-2ssg excited-3psu excited-3dsg excited-2ppu excited-3dpg \
	excited-3ddg excited-4fpu excited-2ppu-well cont-3psu cont-3dsg \
	excited-4psu excited-4fsu excited-4fdu excited-4dpg excited-4ddg \
	excited-4fpiu well-3dsg cont-3ssg

test:
	$(CPU_ENV) python -m pytest tests/ -q

bench:
	python bench.py

pallas-ab:
	python benchmarks/pallas_ab.py

train:
	python -m pinn_for_quantum_wavefunction_surfaces_tpu.cli train \
	  --out runs/flagship --epochs 20000 --gz --trainable-exponent \
	  --lr-schedule step

# The round-2 flagship: separable-spheroidal ansatz trained on the
# deterministic quadrature-variational objective. Runs entirely on host
# CPU (~70 min); reaches E(R) mean 0.007 mHa (RESULTS.md).
flagship:
	$(CPU_ENV) python -m pinn_for_quantum_wavefunction_surfaces_tpu.cli \
	  variational --out runs/flagship_sep --arch separable \
	  --adam-warmup 1500 --lbfgs 800 --spheroidal \
	  --n-r 39 --n-xi 40 --n-eta 24 --dtype float64

evaluate:
	$(CPU_ENV) python -m pinn_for_quantum_wavefunction_surfaces_tpu.cli \
	  evaluate artifacts/flagship_separable.npz --steps 8000 --dtype float64

dryrun:
	$(CPU_ENV) XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	  python __graft_entry__.py dryrun 8

# Excited-state surfaces by deflation (~80 min each on this 1-core host;
# DESIGN.md section 10). 3dsg needs the 2ssg artifact first.
excited-2ssg:
	$(CPU_ENV) python -m pinn_for_quantum_wavefunction_surfaces_tpu.cli \
	  variational --out runs/excited_2ssg --arch separable --xi-node \
	  --spheroidal --deflate artifacts/flagship_separable.npz \
	  --adam-warmup 1500 --lbfgs 800 --lbfgs-memory 50 \
	  --n-r 39 --n-xi 40 --n-eta 24 --dtype float64
	$(CPU_ENV) python -m pinn_for_quantum_wavefunction_surfaces_tpu.cli \
	  evaluate runs/excited_2ssg/variational.npz --dtype float64 \
	  --target-state 2ssg

excited-3psu:
	$(CPU_ENV) python -m pinn_for_quantum_wavefunction_surfaces_tpu.cli \
	  variational --out runs/excited_3psu --arch separable --xi-node \
	  --state ungerade --spheroidal \
	  --deflate artifacts/ungerade_separable.npz \
	  --adam-warmup 1500 --lbfgs 1500 --lbfgs-memory 50 \
	  --n-r 39 --n-xi 48 --n-eta 32 --dtype float64
	$(CPU_ENV) python -m pinn_for_quantum_wavefunction_surfaces_tpu.cli \
	  evaluate runs/excited_3psu/variational.npz --state ungerade \
	  --dtype float64 --target-state 3psu

excited-3dsg:
	$(CPU_ENV) python -m pinn_for_quantum_wavefunction_surfaces_tpu.cli \
	  variational --out runs/excited_3dsg --arch separable --eta-node \
	  --spheroidal --deflate artifacts/flagship_separable.npz \
	  --deflate artifacts/excited_2ssg.npz \
	  --adam-warmup 1500 --lbfgs 800 --lbfgs-memory 50 \
	  --n-r 39 --n-xi 40 --n-eta 24 --dtype float64
	$(CPU_ENV) python -m pinn_for_quantum_wavefunction_surfaces_tpu.cli \
	  evaluate runs/excited_3dsg/variational.npz --dtype float64 \
	  --target-state 3dsg

# Pi/delta sector minima (harmonic transverse factor --m-abs; each is the
# LOWEST state of its symmetry sector, so no deflation is needed and the
# ground-family convergence rate applies; ~80 min each on this 1-core
# host). Total state parity = envelope parity * (-1)^m: 2p pi_u uses the
# gerade envelope, 3d pi_g the ungerade one.
excited-2ppu:
	$(CPU_ENV) python -m pinn_for_quantum_wavefunction_surfaces_tpu.cli \
	  variational --out runs/pi_2ppu --arch separable --m-abs 1 --wide-alpha \
	  --spheroidal --adam-warmup 1500 --lbfgs 800 \
	  --n-r 39 --n-xi 40 --n-eta 24 --dtype float64
	$(CPU_ENV) python -m pinn_for_quantum_wavefunction_surfaces_tpu.cli \
	  evaluate runs/pi_2ppu/variational.npz --dtype float64

excited-3dpg:
	$(CPU_ENV) python -m pinn_for_quantum_wavefunction_surfaces_tpu.cli \
	  variational --out runs/pi_3dpg --arch separable --m-abs 1 --wide-alpha \
	  --state ungerade --spheroidal --adam-warmup 1500 --lbfgs 800 \
	  --n-r 39 --n-xi 40 --n-eta 24 --dtype float64
	$(CPU_ENV) python -m pinn_for_quantum_wavefunction_surfaces_tpu.cli \
	  evaluate runs/pi_3dpg/variational.npz --dtype float64

# The two n<=3 completion states (round 4): 3p pi_u composes the pi-sector
# transverse factor with xi-node deflation against 2ppu; 3s sigma_g is the
# third gerade-sigma radial state — double xi-node + 3-reference deflation.
# NOTE (deflation floor): a deflated state inherits the REFERENCE artifact's
# own wavefunction error squared as a one-sided energy floor — deflate
# against the dense-polished 2ppu (the shipped artifacts/pi_2ppu.npz is);
# the shipped 3ppu re-deflated after the reference was polished
# (0.0133 -> 0.0005 mHa dip at R=0.2).
excited-3ppu:
	$(CPU_ENV) python -m pinn_for_quantum_wavefunction_surfaces_tpu.cli \
	  variational --out runs/pi_3ppu --arch separable --m-abs 1 --wide-alpha \
	  --xi-node --spheroidal --deflate artifacts/pi_2ppu.npz \
	  --adam-warmup 1500 --lbfgs 1500 --lbfgs-memory 50 \
	  --n-r 39 --n-xi 48 --n-eta 32 --dtype float64
	$(CPU_ENV) python -m pinn_for_quantum_wavefunction_surfaces_tpu.cli \
	  evaluate runs/pi_3ppu/variational.npz --dtype float64

excited-3ssg:
	$(CPU_ENV) python -m pinn_for_quantum_wavefunction_surfaces_tpu.cli \
	  variational --out runs/excited_3ssg --arch separable --xi-node2 \
	  --wide-alpha --spheroidal \
	  --deflate artifacts/flagship_separable.npz \
	  --deflate artifacts/excited_2ssg.npz \
	  --deflate artifacts/excited_3dsg.npz \
	  --adam-warmup 1500 --lbfgs 1500 --lbfgs-memory 50 \
	  --n-r 39 --n-xi 48 --n-eta 32 --dtype float64
	$(CPU_ENV) python -m pinn_for_quantum_wavefunction_surfaces_tpu.cli \
	  evaluate runs/excited_3ssg/variational.npz --dtype float64 \
	  --target-state 3ssg

excited-3ddg:
	$(CPU_ENV) python -m pinn_for_quantum_wavefunction_surfaces_tpu.cli \
	  variational --out runs/delta_3ddg --arch separable --m-abs 2 --wide-alpha \
	  --spheroidal --adam-warmup 1500 --lbfgs 800 \
	  --n-r 39 --n-xi 40 --n-eta 24 --dtype float64
	$(CPU_ENV) python -m pinn_for_quantum_wavefunction_surfaces_tpu.cli \
	  evaluate runs/delta_3ddg/variational.npz --dtype float64

# Round-4 stretch: the first n = 4 surface. 4f phi_u is the m = 3 (phi)
# sector minimum — same no-deflation recipe as 2ppu/3ddg; the harmonic
# transverse factor Re[(y+iz)^3] carries the exact azimuthal structure.
excited-4fpu:
	$(CPU_ENV) python -m pinn_for_quantum_wavefunction_surfaces_tpu.cli \
	  variational --out runs/phi_4fpu --arch separable --m-abs 3 --wide-alpha \
	  --spheroidal --adam-warmup 1500 --lbfgs 800 \
	  --n-r 39 --n-xi 40 --n-eta 24 --dtype float64
	$(CPU_ENV) python -m pinn_for_quantum_wavefunction_surfaces_tpu.cli \
	  evaluate runs/phi_4fpu/variational.npz --dtype float64

# Round-4 spectroscopy artifact: the 2p pi_u surface EXTENDED over its
# shallow van-der-Waals-like well (minimum near D ~ 8, i.e. R ~ 4 — the
# edge of the standard [0.2, 4] domain; D_e ~ 9.5 mHa, ~280 cm^-1
# fundamental). Warm-resumes the shipped dense-polished artifact on
# R in [1.5, 8] so `cli vibrations` can solve the nuclear problem of an
# EXCITED electronic surface (VERDICT round-3 item 5). Sector minimum —
# no deflation needed at any R.
excited-2ppu-well:
	$(CPU_ENV) python -m pinn_for_quantum_wavefunction_surfaces_tpu.cli \
	  variational artifacts/pi_2ppu.npz --out runs/pi_2ppu_well \
	  --arch separable --m-abs 1 --wide-alpha --spheroidal \
	  --r-lo 1.5 --r-hi 8 \
	  --adam-warmup 500 --lbfgs 800 --lbfgs-memory 50 \
	  --n-r 40 --n-xi 48 --n-eta 32 --dtype float64
	$(CPU_ENV) python -m pinn_for_quantum_wavefunction_surfaces_tpu.cli \
	  evaluate runs/pi_2ppu_well/variational.npz --dtype float64 \
	  --r-lo 1.5 --r-hi 8
	$(CPU_ENV) python -m pinn_for_quantum_wavefunction_surfaces_tpu.cli \
	  vibrations runs/pi_2ppu_well/evaluated.npz --n-levels 3

# Round-4 dense continuations (the small-R lever run to convergence —
# VERDICT round-3 item 4): warm-resume a shipped excited artifact on
# DENSE 96x64 grids with log-clustered R rows (the R = 0.2 end dominates
# every excited max error; E'''' ~ (R+0.3)^-5) and a fresh 400-step
# L-BFGS memory. Deflated states re-deflate against the CURRENT shipped
# references (the deflation-floor rule: polish references before
# dependents — RESULTS.md round-4). Plan ~45 min each on this 1-core host
# (~10 min f64 96x64 compile, then ~5-7 s/step at k=1 deflation).
cont-3psu:
	$(CPU_ENV) python -m pinn_for_quantum_wavefunction_surfaces_tpu.cli \
	  variational artifacts/excited_3psu.npz --out runs/cont_3psu \
	  --arch separable --xi-node --wide-alpha --state ungerade \
	  --spheroidal --deflate artifacts/ungerade_separable.npz \
	  --adam-warmup 0 --lbfgs 400 --lbfgs-memory 50 \
	  --n-r 39 --n-xi 96 --n-eta 64 --r-cluster log --dtype float64
	$(CPU_ENV) python -m pinn_for_quantum_wavefunction_surfaces_tpu.cli \
	  evaluate runs/cont_3psu/variational.npz --state ungerade \
	  --dtype float64 --target-state 3psu

cont-3dsg:
	$(CPU_ENV) python -m pinn_for_quantum_wavefunction_surfaces_tpu.cli \
	  variational artifacts/excited_3dsg.npz --out runs/cont_3dsg \
	  --arch separable --eta-node --wide-alpha --spheroidal \
	  --deflate artifacts/flagship_separable.npz \
	  --deflate artifacts/excited_2ssg.npz \
	  --adam-warmup 0 --lbfgs 400 --lbfgs-memory 50 \
	  --n-r 39 --n-xi 96 --n-eta 64 --r-cluster log --dtype float64
	$(CPU_ENV) python -m pinn_for_quantum_wavefunction_surfaces_tpu.cli \
	  evaluate runs/cont_3dsg/variational.npz --dtype float64 \
	  --target-state 3dsg

# Round-5 tightening pass (VERDICT r4 item 7): the two states still on
# the 0.05 mHa max bar are small-R/deflation-floor dominated — 3ssg
# re-deflates against the CURRENT dense references (incl. the round-5
# 3dsg at 0.0079) before its own dense log-row continuation.
cont-3ssg:
	$(CPU_ENV) python -m pinn_for_quantum_wavefunction_surfaces_tpu.cli \
	  variational artifacts/excited_3ssg.npz --out runs/cont_3ssg \
	  --arch separable --xi-node2 --wide-alpha --spheroidal \
	  --deflate artifacts/flagship_separable.npz \
	  --deflate artifacts/excited_2ssg.npz \
	  --deflate artifacts/excited_3dsg.npz \
	  --adam-warmup 0 --lbfgs 400 --lbfgs-memory 50 \
	  --n-r 39 --n-xi 96 --n-eta 64 --r-cluster log --dtype float64
	$(CPU_ENV) python -m pinn_for_quantum_wavefunction_surfaces_tpu.cli \
	  evaluate runs/cont_3ssg/variational.npz --dtype float64 \
	  --target-state 3ssg

# Round-5: the n = 4 sigma_u pair (DESIGN.md S12). 4p sigma_u is the
# third radial ungerade state (two xi nodes, k = 2 deflation against the
# shipped 2psu + 3psu); once IT ships, 4f sigma_u — the state plain
# k-counting cannot reach (its curve crosses 4psu's at R* = 1.933,
# test_exact.py::test_n4_radial_state_4psu_and_crossing) — becomes
# reachable with k = 3 deflation: the deflated-complement minimum is
# 4fsu at EVERY R regardless of the crossing, because all three states
# below-or-crossing are projected out. Split recipe: TPU Adam warmup
# (drop the CPU_ENV prefix) + CPU f64 L-BFGS, like 4fpu.
# BOTH states need the --xi-span 40 box for TRAINING, not just scoring:
# trained on span 20 the optimiser spreads the diffuse n=4 tail past the
# box (4psu read -0.054 mHa signed on span 20 but +0.18 on the honest
# box — same mechanism as the round-4 4fpu lesson, now upstream of the
# objective itself).
excited-4psu:
	$(CPU_ENV) python -m pinn_for_quantum_wavefunction_surfaces_tpu.cli \
	  variational --out runs/excited_4psu --arch separable --xi-node2 \
	  --state ungerade --wide-alpha --spheroidal --xi-span 40 \
	  --r-cluster log \
	  --deflate artifacts/ungerade_separable.npz \
	  --deflate artifacts/excited_3psu.npz \
	  --adam-warmup 1500 --lbfgs 1500 --lbfgs-memory 50 \
	  --n-r 39 --n-xi 64 --n-eta 32 --dtype float64 --target-state 4psu
	$(CPU_ENV) python -m pinn_for_quantum_wavefunction_surfaces_tpu.cli \
	  evaluate runs/excited_4psu/variational.npz --state ungerade \
	  --dtype float64 --target-state 4psu

excited-4fsu:
	$(CPU_ENV) python -m pinn_for_quantum_wavefunction_surfaces_tpu.cli \
	  variational --out runs/excited_4fsu --arch separable --eta-node \
	  --state ungerade --wide-alpha --spheroidal --xi-span 40 \
	  --deflate artifacts/ungerade_separable.npz \
	  --deflate artifacts/excited_3psu.npz \
	  --deflate artifacts/excited_4psu.npz \
	  --adam-warmup 1500 --lbfgs 1500 --lbfgs-memory 50 \
	  --n-r 39 --n-xi 64 --n-eta 32 --dtype float64 --target-state 4fsu
	$(CPU_ENV) python -m pinn_for_quantum_wavefunction_surfaces_tpu.cli \
	  evaluate runs/excited_4fsu/variational.npz --state ungerade \
	  --dtype float64 --target-state 4fsu

# Round-5: the n = 4 m > 0 shell (oracle pinned in
# test_exact.py::test_n4_m_sector_shell). All n = 4 states train AND
# score on the honest --xi-span 40 box (the 4psu lesson above). The
# pi_u ladder has the OPPOSITE resolution to the sigma_u pair: the
# angular branch 4f pi_u sits BELOW the radial 4p pi_u at every in-span
# R (crossing 3ppu x 4fpiu at R* = 4.115, OUTSIDE the box), so k = 2
# deflation reaches 4fpiu directly and 4ppu is the k = 3 state.
# Split recipe like 4fpu/4psu: TPU Adam warmup + CPU f64 L-BFGS.
excited-4fdu:
	$(CPU_ENV) python -m pinn_for_quantum_wavefunction_surfaces_tpu.cli \
	  variational --out runs/delta_4fdu --arch separable --m-abs 2 \
	  --state ungerade --wide-alpha --spheroidal --xi-span 40 \
	  --adam-warmup 1500 --lbfgs 800 --lbfgs-memory 50 \
	  --n-r 39 --n-xi 48 --n-eta 32 --dtype float64
	$(CPU_ENV) python -m pinn_for_quantum_wavefunction_surfaces_tpu.cli \
	  evaluate runs/delta_4fdu/variational.npz --dtype float64

excited-4dpg:
	$(CPU_ENV) python -m pinn_for_quantum_wavefunction_surfaces_tpu.cli \
	  variational --out runs/pi_4dpg --arch separable --m-abs 1 \
	  --state ungerade --wide-alpha --xi-node --spheroidal --xi-span 40 \
	  --deflate artifacts/pi_3dpg.npz --r-cluster log \
	  --adam-warmup 1500 --lbfgs 1500 --lbfgs-memory 50 \
	  --n-r 39 --n-xi 64 --n-eta 32 --dtype float64
	$(CPU_ENV) python -m pinn_for_quantum_wavefunction_surfaces_tpu.cli \
	  evaluate runs/pi_4dpg/variational.npz --dtype float64

excited-4ddg:
	$(CPU_ENV) python -m pinn_for_quantum_wavefunction_surfaces_tpu.cli \
	  variational --out runs/delta_4ddg --arch separable --m-abs 2 \
	  --wide-alpha --xi-node --spheroidal --xi-span 40 \
	  --deflate artifacts/delta_3ddg.npz --r-cluster log \
	  --adam-warmup 1500 --lbfgs 1500 --lbfgs-memory 50 \
	  --n-r 39 --n-xi 64 --n-eta 32 --dtype float64
	$(CPU_ENV) python -m pinn_for_quantum_wavefunction_surfaces_tpu.cli \
	  evaluate runs/delta_4ddg/variational.npz --dtype float64

excited-4fpiu:
	$(CPU_ENV) python -m pinn_for_quantum_wavefunction_surfaces_tpu.cli \
	  variational --out runs/pi_4fpiu --arch separable --m-abs 1 \
	  --wide-alpha --eta-node --spheroidal --xi-span 40 \
	  --deflate artifacts/pi_2ppu.npz \
	  --deflate artifacts/pi_3ppu.npz \
	  --adam-warmup 1500 --lbfgs 1500 --lbfgs-memory 50 \
	  --n-r 39 --n-xi 64 --n-eta 32 --dtype float64 --target-state 4fpiu
	$(CPU_ENV) python -m pinn_for_quantum_wavefunction_surfaces_tpu.cli \
	  evaluate runs/pi_4fpiu/variational.npz --dtype float64 \
	  --target-state 4fpiu

# Round-5 spectroscopy: the 3d sigma_g well (minimum near R ~ 4.4,
# D_e ~ 50 mHa below the H(n=2) asymptote — much deeper than the 2ppu
# well). Needs the deflation chain EXTENDED to R in [2.5, 8] first
# (references trained on [0.2, 4] extrapolate garbage past R = 4):
# warm-resume 1ssg, then 2ssg (deflate ext-1ssg), then the 3dsg well
# itself (k = 2 against both), then evaluate + `cli vibrations`.
well-3dsg:
	$(CPU_ENV) python -m pinn_for_quantum_wavefunction_surfaces_tpu.cli \
	  variational artifacts/flagship_separable.npz --out runs/well_1ssg \
	  --arch separable --spheroidal --r-lo 2.5 --r-hi 8 \
	  --adam-warmup 600 --lbfgs 400 --lbfgs-memory 50 \
	  --n-r 40 --n-xi 48 --n-eta 32 --dtype float64
	$(CPU_ENV) python -m pinn_for_quantum_wavefunction_surfaces_tpu.cli \
	  variational artifacts/excited_2ssg.npz --out runs/well_2ssg \
	  --arch separable --xi-node --wide-alpha --spheroidal \
	  --r-lo 2.5 --r-hi 8 --deflate runs/well_1ssg/variational.npz \
	  --adam-warmup 600 --lbfgs 400 --lbfgs-memory 50 \
	  --n-r 40 --n-xi 48 --n-eta 32 --dtype float64
	$(CPU_ENV) python -m pinn_for_quantum_wavefunction_surfaces_tpu.cli \
	  variational artifacts/excited_3dsg.npz --out runs/well_3dsg \
	  --arch separable --eta-node --wide-alpha --spheroidal \
	  --r-lo 2.5 --r-hi 8 --deflate runs/well_1ssg/variational.npz \
	  --deflate runs/well_2ssg/variational.npz \
	  --adam-warmup 600 --lbfgs 400 --lbfgs-memory 50 \
	  --n-r 40 --n-xi 48 --n-eta 32 --dtype float64
	$(CPU_ENV) python -m pinn_for_quantum_wavefunction_surfaces_tpu.cli \
	  evaluate runs/well_3dsg/variational.npz --dtype float64 \
	  --r-lo 2.5 --r-hi 8 --target-state 3dsg
	$(CPU_ENV) python -m pinn_for_quantum_wavefunction_surfaces_tpu.cli \
	  vibrations runs/well_3dsg/evaluated.npz --n-levels 4 --j-max 5

# Per-R variational-floor study for both ansatz families (39 Rs each,
# figure -> artifacts/figures/dispersion.pdf; ~1.5 h on this 1-core host)
dispersion:
	$(CPU_ENV) python benchmarks/dispersion.py

# The reference's exact f64 recipe (5000 ep const lr + 2000 ep fine-tune),
# 3 seeds on the TPU (~90 min), then CPU scoring vs the ODE oracle
ref-recipe:
	bash -c 'for seed in 12345 777 2024; do \
	  python -m pinn_for_quantum_wavefunction_surfaces_tpu.cli train \
	    --out runs/ref_recipe/s$$seed/stage1 --dtype float64 --seed $$seed; \
	  python -m pinn_for_quantum_wavefunction_surfaces_tpu.cli finetune \
	    runs/ref_recipe/s$$seed/stage1/best.npz \
	    --out runs/ref_recipe/s$$seed/stage2 --dtype float64; \
	done'
	$(CPU_ENV) python benchmarks/ref_recipe_score.py
