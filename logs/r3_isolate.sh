#!/bin/bash
# isolate the plummer-1M drift blowup: direct (exact forces) vs tree at 256k
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
cd /root/repo
echo "=== direct 256k ==="
python -m spacetpu --frontend none --preset plummer_sphere --n 262144 \
  --algorithm direct --steps 1000 --dt 1e-3 --eps 1e-2
echo "=== tree 256k (auto modes, measured caps) ==="
python -m spacetpu --frontend none --preset plummer_sphere --n 262144 \
  --algorithm tree --k-near auto --theta 0.5 --steps 1000 --dt 1e-3 --eps 1e-2
echo "ALL DONE"
