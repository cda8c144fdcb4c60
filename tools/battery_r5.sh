#!/bin/bash
# Round-5 recovery battery: probe the TPU tunnel every ~3 min; on first
# recovery run the round-5 device measurements and a full driver-shape
# bench.  Logs to /tmp/battery_r5/.  Single-shot (~6 h window).
cd /root/repo
mkdir -p /tmp/battery_r5
for i in $(seq 1 120); do
  if timeout 90 python -c "import jax,numpy as np; assert float(jax.device_put(np.arange(4)).sum())==6.0" 2>/dev/null; then
    echo "tunnel up at $(date)" | tee /tmp/battery_r5/recovered.txt
    timeout 240 python -c "
import json, time, numpy as np, jax
x = jax.device_put(np.arange(4)); assert float(x.sum()) == 6.0
src = np.zeros(1 << 22, dtype=np.float32)
t0 = time.time(); big = jax.block_until_ready(jax.device_put(src)); h2d = 16.0/max(time.time()-t0,1e-9)
big = big + 1
t0 = time.time(); _ = np.asarray(big); d2h = 16.0/max(time.time()-t0,1e-9)
t0 = time.time(); [np.asarray(x+i)[:1] for i in range(5)]; rtt=(time.time()-t0)/5*1e3
print(json.dumps({'h2d_mb_s': round(h2d,1), 'd2h_mb_s': round(d2h,1), 'pull_rtt_ms': round(rtt,1)}))
" > /tmp/battery_r5/health.json 2>/tmp/battery_r5/health.err
    cat /tmp/battery_r5/health.json
    # 1. gemm vs pair screened step A/B (131k + 524k)
    timeout 900 python tools/probe_gemm_ab.py \
      > /tmp/battery_r5/gemm_ab_131k.log 2>&1
    PROBE_T=524288 timeout 900 python tools/probe_gemm_ab.py \
      > /tmp/battery_r5/gemm_ab_524k.log 2>&1
    # 2. whole-genome -g A/B (parity + timing)
    timeout 1800 python tools/probe_g_device.py \
      > /tmp/battery_r5/g_ab.log 2>&1
    # 3. sketch device A/B (parity + throughput)
    timeout 1800 python tools/probe_sketch_device.py \
      > /tmp/battery_r5/sketch_ab.log 2>&1
    # 4. device index-build experiment (ROADMAP item 8 evidence)
    timeout 900 python tools/probe_index_build_device.py \
      > /tmp/battery_r5/build_ab.log 2>&1
    # 5. full driver-shape bench (demo + extras + deferred re-measure)
    timeout 3000 python bench.py > /tmp/battery_r5/bench.json 2>/tmp/battery_r5/bench.err
    echo "battery done at $(date)" >> /tmp/battery_r5/recovered.txt
    exit 0
  fi
  sleep 170
done
echo "tunnel never recovered" > /tmp/battery_r5/never.txt
