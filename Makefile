.PHONY: test bench bench-small smoke dryrun profile decode-bench native

test:
	python -m pytest tests/ -q

bench:
	python bench.py

bench-small:
	python bench.py --small

smoke:
	python tools/smoke_tpu.py

dryrun:
	python __graft_entry__.py

profile:
	python tools/profile_step.py

decode-bench:
	python tools/decode_bench.py

native:
	python -c "from sparse_matrix_tuning_tpu.data.native import native_available; assert native_available(); print('native collator OK')"
