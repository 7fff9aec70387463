#!/bin/bash
# Sequential hardware validation: correctness, NTT marginal, headline
# bench, rotation bench.  Run with the TPU otherwise idle.
set -u
cd /root/repo
echo "== stream_test (bit-exactness) =="
timeout -k 10 560 python tools/stream_test.py 16 2>&1 | grep -v WARNING | head -4
echo "== stream marginal (BP=4) =="
ALOHA_STREAM_BP=4 timeout -k 10 560 python tools/stream_marginal.py 2>&1 | grep -v WARNING | tail -1
echo "== bench.py =="
timeout -k 10 900 python bench.py 2>&1 | grep -v WARNING | tail -2
echo "== rotate bench (B=16) =="
B=16 timeout -k 10 1500 python tools/bench_rotate.py 2>&1 | grep -v WARNING | tail -4
echo "== done =="
