# Pre-commit gate (run before every snapshot commit): full test suite plus
# the asset-determinism invariant (regenerating committed assets must be a
# no-op — CLAUDE.md §invariants).
.PHONY: check assets native

check:
	python -m pytest tests/ -q
	python scripts/make_assets.py
	git diff --exit-code -- sparse_matrices configs

assets:
	python scripts/make_assets.py

native:
	$(MAKE) -C native
