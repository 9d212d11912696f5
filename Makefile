# Common targets. TPU targets need the chip free (one process at a time).

.PHONY: test bench smoke experiments native demo clean

demo:  ## end-to-end on CPU: synth data -> train -> eval -> export -> online daemon
	python scripts/demo.py

test:
	python -m pytest tests/ -x -q

bench:  ## headline JSON line (runs on the TPU)
	python bench.py

smoke:  ## compile+run every Pallas kernel on the real TPU
	python scripts/tpu_smoke.py

experiments:  ## full preset matrix -> RESULTS.md (runs on the TPU)
	python scripts/run_experiments.py --steps 2000

native:  ## build the C data-plane extension
	cd native && python setup.py build_ext --inplace

clean:
	rm -rf native/build native/_fastio*.so .jax_cache* **/__pycache__
