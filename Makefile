# Convenience targets (1-core host; golden sweep runs nice'd subprocesses)

golden:
	python scripts/golden_full.py --out GOLDEN_FULL_r04.txt --resume GOLDEN_FULL_r03.txt

golden-fresh:
	python scripts/golden_full.py --out GOLDEN_FULL_r04.txt

test:
	python -m pytest tests/ -q

.PHONY: golden golden-fresh test
