# One-command gates (mirrors .github/workflows/ci.yml; the reference's
# workflow lived in the never-run .github/workflow/ directory).
#
#   make lint   syntax/bytecode sweep (+ ruff when installed)
#   make fast   quick tier: geometry/diffusion/config/analysis
#   make test   default tier (non-slow, non-heavy)
#   make heavy  compile/oracle-heavy tier (torch parity, omegafold full
#               model, multi-device, sampler/train compiles)
#   make slow   long integration tests (overfit, 2-process training,
#               training-dynamics parity); 14:14 on 1 core (measured r4)
#   make check  lint + fast (the inner-loop gate)
#
# Measured on a 1-CORE host with the committed AVX2-pinned compile cache
# warm (re-measured 2026-08-19 after the round-5 live-dir cache GC):
#   fast tier            1:26      (171 tests)
#   test tier (default)  4:20 at 226 tests (round-5 additions bring it to
#                                   ~250; first results within seconds —
#                                   the re-tier goal)
#   heavy tier           9:37      (66 tests; r4 measured 18:46 — the
#                                   round-5 live-dir cache GC + fresh warm
#                                   entries halved it)
#   full suite COLD      42:58     (293 tests before round-5 additions;
#                                   the live-dir GC baseline run)
# On a multi-core host the heavy tier shrinks several-fold (the cost is
# serialized XLA compiles + torch CPU oracles).

PY ?= python

# quick tier: no torch, no reference checkout, no multi-device compiles
FAST_TESTS = tests/test_rigid.py tests/test_rigid_golden.py \
             tests/test_so3.py tests/test_frames.py tests/test_diffusion.py \
             tests/test_config.py tests/test_metrics.py tests/test_dssp.py \
             tests/test_dssp_oracle.py tests/test_tm_oracle.py \
             tests/test_data.py tests/test_analysis_utils.py \
             tests/test_mmcif.py tests/test_preprocess.py \
             tests/test_energies.py tests/test_dcd.py \
             tests/test_ingest_release.py \
             tests/test_structure_checks.py tests/test_rollout_quality_tool.py

.PHONY: lint fast test heavy slow check cache-gc cache-record

# committed-compile-cache hygiene (tools/cache_gc.py): report staleness +
# orphans (exit 1 if any); `make cache-gc APPLY=--apply` deletes orphans;
# `make cache-record` re-snapshots the manifest after a full warm workload
cache-gc:
	$(PY) tools/cache_gc.py $(APPLY)

cache-record:
	$(PY) tools/cache_gc.py --record

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
	$(PY) -m pytest tests/ -q -m "not slow and not heavy"

heavy:
	$(PY) -m pytest tests/ -q -m "heavy and not slow"

slow:
	$(PY) -m pytest tests/ -q -m slow

check: lint fast
