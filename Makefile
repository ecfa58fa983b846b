# One-command gates (mirrors .github/workflows/ci.yml; the reference's
# workflow lived in the never-run .github/workflow/ directory).
#
#   make lint   syntax/bytecode sweep (+ ruff when installed)
#   make fast   quick tier: geometry/diffusion/config/analysis (~1-2 min)
#   make test   full default suite (non-slow)
#   make slow   long integration tests (overfit, training-dynamics parity)
#   make check  lint + fast (the inner-loop gate)

PY ?= python

# quick tier: no torch, no reference checkout, no multi-device compiles
FAST_TESTS = tests/test_rigid.py tests/test_rigid_golden.py \
             tests/test_so3.py tests/test_frames.py tests/test_diffusion.py \
             tests/test_config.py tests/test_metrics.py tests/test_dssp.py \
             tests/test_dssp_oracle.py tests/test_tm_oracle.py \
             tests/test_data.py tests/test_analysis_utils.py \
             tests/test_mmcif.py tests/test_preprocess.py \
             tests/test_structure_checks.py

.PHONY: lint fast test slow check

lint:
	$(PY) -m compileall -q dynamicpdb_tpu tools tests bench.py __graft_entry__.py
	@if $(PY) -c "import ruff" 2>/dev/null; then \
		$(PY) -m ruff check dynamicpdb_tpu tools tests; \
	else \
		echo "ruff not installed; syntax sweep only"; \
	fi

fast:
	$(PY) -m pytest $(FAST_TESTS) -q

test:
	$(PY) -m pytest tests/ -q -m "not slow"

slow:
	$(PY) -m pytest tests/ -q -m slow

check: lint fast
