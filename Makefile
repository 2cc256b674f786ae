# Developer entry points.

test:
	python -m pytest tests/ -q

native:
	$(MAKE) -C thrifty_tpu/native lib

bench:
	python bench.py --verbose

example:
	$(MAKE) -C example simulate && $(MAKE) -C example

clean:
	rm -rf thrifty_tpu/native/*.so .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true

.PHONY: test native bench example clean
