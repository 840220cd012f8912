# Fast CPU test run: skips the axon TPU-tunnel registration (~85s/process).
test:
	PALLAS_AXON_POOL_IPS= python -m pytest tests/ -x -q

# Full-size numeric weight-port parity (slow, ~10 min on one CPU core):
# full SD-1.5 / DDPM-celebahq / LDM torch mirrors vs the Flax models.
test-full-port:
	PALLAS_AXON_POOL_IPS= DIE_TPU_FULL_PORT=1 python -m pytest tests/test_full_port.py -x -q

bench:
	python bench.py

# Chip measurement suites (one at a time — only one process can hold the TPU)
bench-seg-train:
	python scripts/bench_seg_train.py

ab-batch:
	python scripts/ab_batch_scaling.py

# Multi-chip AOT validations (8 virtual CPU devices, no TPU needed)
multichip-analyze:
	PALLAS_AXON_POOL_IPS= python scripts/multichip_real_shapes.py
	PALLAS_AXON_POOL_IPS= python scripts/multichip_seg_train.py

# v5e-8 projection + sweep partition inspection (8 virtual CPU devices)
multichip-project:
	PALLAS_AXON_POOL_IPS= python scripts/project_v5e8.py
	PALLAS_AXON_POOL_IPS= python scripts/multichip_sweep.py
