#!/bin/bash
cd /root/repo
for cfg in "1024 512" "512 1536" "2048 1536" "8192 6144" "1024 1536"; do
  set -- $cfg
  echo "=== BLOCK_N=$1 BLOCK_K=$2"
  AMPHION_INT4_BLOCK_N=$1 AMPHION_INT4_BLOCK_K=$2 timeout 1800 python _ab_vevo_ar.py 2>/dev/null | tail -1
done
