# Developer entry points (analogue of the reference's Makefile check/autoformat)

.PHONY: test test-fast check bench smoke native clean memproof

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -m "not slow"

# lint gate: ruff+black when installed (not baked into the TPU image), always compile-check
check:
	python -m compileall -q merv_tpu scripts bench.py __graft_entry__.py
	-ruff check merv_tpu scripts 2>/dev/null || true
	-black --check merv_tpu scripts 2>/dev/null || true

bench:
	python bench.py

smoke:
	python scripts/tpu_smoke.py

# compiler-verified HBM guards: fail if the v5e-8 training recipes or the
# single-chip 7B serving engine stop fitting 16 GiB/device (the finetune fit
# is razor-thin — re-run after ANY train_step/transformer change)
memproof:
	python scripts/memory_proof.py --stage both --pdbs 2
	python scripts/memory_proof.py --stage serving --llm 7b --slots 8 --max-len 2048

native:
	python -c "from merv_tpu.native import get_lib; get_lib(); print('native videodec built')"

clean:
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
	rm -f merv_tpu/native/libvideodec.so
