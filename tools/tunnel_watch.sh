#!/bin/bash
# Probe the TPU tunnel every ~3 min; on first recovery, run the round-4
# device measurement battery and log everything to /tmp/battery/.
# Single-shot: exits after the battery completes (or after ~6 h).
cd /root/repo
mkdir -p /tmp/battery
for i in $(seq 1 120); do
  if timeout 90 python -c "import jax,numpy as np; assert float(jax.device_put(np.arange(4)).sum())==6.0" 2>/dev/null; then
    echo "tunnel up at $(date)" | tee /tmp/battery/recovered.txt
    # 1. health
    timeout 240 python -c "
import json, time, numpy as np, jax
x = jax.device_put(np.arange(4)); assert float(x.sum()) == 6.0
src = np.zeros(1 << 22, dtype=np.float32)
t0 = time.time(); big = jax.block_until_ready(jax.device_put(src)); h2d = 16.0/max(time.time()-t0,1e-9)
big = big + 1
t0 = time.time(); _ = np.asarray(big); d2h = 16.0/max(time.time()-t0,1e-9)
t0 = time.time(); [np.asarray(x+i)[:1] for i in range(5)]; rtt=(time.time()-t0)/5*1e3
print(json.dumps({'h2d_mb_s': round(h2d,1), 'd2h_mb_s': round(d2h,1), 'pull_rtt_ms': round(rtt,1)}))
" > /tmp/battery/health.json 2>/tmp/battery/health.err
    cat /tmp/battery/health.json
    # 2. screened step at 131k (pair kernel + pack4)
    timeout 900 python tools/probe_screened.py --targets 131072 --batch 4096 \
      > /tmp/battery/screened_131k.json 2>/tmp/battery/screened_131k.err
    # 3. screened step at 524k (the GTDB full profiling chunk scale)
    timeout 1200 python tools/probe_screened.py --targets 524288 --batch 4096 \
      > /tmp/battery/screened_524k.json 2>/tmp/battery/screened_524k.err
    # 4. wide-T device e2e extras (131k screened + dense/gbit)
    timeout 900 python tools/bench_large_t.py --targets 131072 --reads 20000 \
      --backends jax-screened --batch 4096 \
      > /tmp/battery/lt_device_131k.json 2>/tmp/battery/lt_device_131k.err
    timeout 900 python tools/bench_large_t.py --targets 131072 --reads 12288 \
      --backends jax-dense --batch 1024 \
      > /tmp/battery/lt_dense_131k.json 2>/tmp/battery/lt_dense_131k.err
    # 5. full driver-shape bench (demo + extras + jax child)
    timeout 3000 python bench.py > /tmp/battery/bench.json 2>/tmp/battery/bench.err
    echo "battery done at $(date)" >> /tmp/battery/recovered.txt
    exit 0
  fi
  sleep 170
done
echo "tunnel never recovered" > /tmp/battery/never.txt
