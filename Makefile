# Developer entry points (see README.md / CLAUDE.md)

.PHONY: test test-tpu bench validate golden-regen lint

test:
	python -m pytest tests/ -q

test-tpu:
	RUN_TPU_TESTS=1 python -m pytest tests/ -q -m tpu

bench:
	python bench.py

validate:
	python validate.py

golden-regen:
	GOLDEN_REGEN=1 python -m pytest tests/test_golden.py -q

lint:
	python -m compileall -q gppvae_tpu tests bench.py validate.py __graft_entry__.py
