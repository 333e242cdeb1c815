#!/bin/bash
# Round-5 chip bench queue (run serially; each is subprocess-isolated).
set -x
cd /root/repo
python scripts/bench_serving.py --concurrency 8   2>serving8.log
python scripts/bench_serving.py --concurrency 16  2>serving16.log
python scripts/bench_serving.py --concurrency 32  2>serving32.log
python scripts/bench_sft.py                       2>sft.log
python scripts/bench_needle.py                    2>needle.log
