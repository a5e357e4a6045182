# Developer entry points. TPU runs use the ambient (axon) backend; CPU test
# runs force the 8-fake-device platform via tests/conftest.py.

.PHONY: test bench bench-configs bench-dp profile eval demo train-weights clean

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

bench-configs:
	python scripts/bench_configs.py --quick

bench-dp:
	python scripts/bench_dp_scaling.py --quick

profile:
	python scripts/profile_stages.py

eval:
	python scripts/eval_lol.py --max-images 8

demo:
	python examples/demo.py

train-weights:
	python scripts/train_weights.py --steps 4000 --batch 16 --crop 256 \
		--models curve hybrid fcn decom

clean:
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null; true
	rm -rf .pytest_cache demo_out
