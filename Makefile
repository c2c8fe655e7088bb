# Developer entry points (mirrors the reference's Makefile targets: build,
# test, lint, e2e — adapted to the Python/JAX toolchain).

PYTHON ?= python
# Disable the TPU relay shim for CPU-only targets so a wedged relay can't
# hang interpreter startup; tests force the CPU backend in tests/conftest.py.
CPU_ENV := PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu

.PHONY: all native test test-js test-e2e test-e2e-real eval-independent bench lint clean

all: native test test-js

native: _build/libocrs_native.so

_build/libocrs_native.so: native/ocrs_native.cpp
	mkdir -p _build
	g++ -O3 -march=native -std=c++17 -shared -fPIC $< -o $@

test: native
	$(CPU_ENV) $(PYTHON) -m pytest tests/ -x -q

# Extension pure-logic unit tests (js/extension/lib.test.js). Skips with a
# notice when node is not installed (this repo's TPU image has no JS
# runtime; CI runs them).
test-js:
	@if command -v node >/dev/null 2>&1; then \
		cd js/extension && node --test; \
	else \
		echo "test-js: node not installed, skipping extension unit tests"; \
	fi

test-e2e: native
	$(CPU_ENV) $(PYTHON) tools/test_e2e.py

# Trained-weight tier: shipped weights vs the REFERENCE golden images,
# word-level F1 >= 0.8 (runs on the TPU when available).
test-e2e-real: native
	$(PYTHON) tools/test_e2e.py --real

# Anti-circularity accuracy tier: pages rendered through paths the training
# renderer never touches (matplotlib/Agg, pygame/SDL_ttf, held-out pixel
# font), word F1 >= 0.85 overall (runs on the TPU when available).
eval-independent: native
	$(PYTHON) tools/eval_independent.py --min-f1 0.85

update-golden:
	$(CPU_ENV) $(PYTHON) tools/gen_golden.py
	$(CPU_ENV) $(PYTHON) tools/test_e2e.py --update

bench: native
	$(PYTHON) bench.py

lint:
	$(PYTHON) -m compileall -q ocrs_tpu tools bench.py __graft_entry__.py

clean:
	rm -rf _build __pycache__ ocrs_tpu/__pycache__ tests/__pycache__
