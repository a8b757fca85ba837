# Convenience targets. The native library also auto-builds on first use
# (evr_tpu/native/loader.py).

.PHONY: all native test test-fast bench check clean parity-real parity-rehearse demo

# full local gate: tests on the virtual CPU mesh + driver entry points
check: test
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	python -c "import jax; jax.config.update('jax_platforms','cpu'); \
	import __graft_entry__ as g; fn,a = g.entry(); jax.jit(fn)(*a); g.dryrun_multichip(8)"

all: native

native:
	g++ -O3 -std=c++17 -shared -fPIC -pthread \
	    evr_tpu/native/src/image_loader.cc \
	    -o evr_tpu/native/libevr_native.so -ljpeg

# full suite: ~55 min on this 1-core host (measured round 4) — run before
# committing work that spans subsystems
test:
	python -m pytest tests/ -q -rs

# smoke tier: one representative test per subsystem, < 5 min (tests/smoke.txt)
test-fast:
	grep -v '^#' tests/smoke.txt | xargs python -m pytest -q -rs

# real-asset parity gates: runs what the mounted assets allow, emits a
# machine-readable report (parity_real_report.json) naming every gate it
# had to SKIP and the exact env knob that would enable it (RUNBOOK.md §9b)
parity-real:
	python -m evr_tpu.tools.parity_real

# the same four gates driven end-to-end on SYNTHETIC assets (random-weight
# HF CLIP/Whisper dirs, toy tokenizers, structurally-valid BPE table):
# proves the harness mechanics are executable today, so real weights only
# change values, never code paths. Exit 0 iff all 4 gates' mechanics pass.
# Artifact: parity_rehearsal_report.json (~10 min on this 1-core host)
parity-rehearse:
	JAX_PLATFORMS=cpu python -m evr_tpu.tools.parity_real --rehearse \
	    --rehearse-dir /tmp/evr_parity_rehearse

# the reference's whole lifecycle, one command, no gated assets: fixture
# corpus -> Excel test set -> fine-tune (recorded R@K lift) -> deploy
# bundle w/ AOT encoders -> boot serving on the tuned model -> replay all
# 21 UI flows over real HTTP. Artifact: tests/golden/demo_loop.log
demo:
	python tools/demo_loop.py

bench:
	python bench.py

clean:
	rm -f evr_tpu/native/libevr_native.so
	find . -name __pycache__ -type d -exec rm -rf {} +
