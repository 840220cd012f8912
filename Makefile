# Fast CPU test run: skips the axon TPU-tunnel registration (~85s/process).
test:
	PALLAS_AXON_POOL_IPS= python -m pytest tests/ -x -q

bench:
	python bench.py
