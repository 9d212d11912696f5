# Common targets. TPU targets need the chip free (one process at a time).

.PHONY: test test-all bench smoke experiments native demo clean

demo:  ## end-to-end on CPU: synth data -> train -> eval -> export -> online daemon
	python scripts/demo.py

test: native  ## fast tier (slow-marked kernel/mesh parity tests excluded)
	python -m pytest tests/ -x -q -m "not slow"

test-all: native  ## full suite incl. slow interpret-mode kernel parity
	# pytest-xdist measured SLOWER here (-n 4 = +14% on the slow
	# transformer_decode subset): this host has 1 CPU core and the
	# suite is compute-bound; revisit only on a multi-core box.
	python -m pytest tests/ -x -q

bench:  ## headline JSON line (runs on the TPU)
	python bench.py

smoke:  ## compile+run every Pallas kernel on the real TPU
	python scripts/tpu_smoke.py

experiments:  ## full preset matrix -> RESULTS.md (runs on the TPU)
	python scripts/run_experiments.py --steps 2000

native:  ## build the C data-plane extension into the package
	python setup.py build_ext --inplace

clean:
	rm -rf build native/build native/_fastio*.so \
	    longterm360fov_tpu/_fastio*.so .jax_cache* **/__pycache__
