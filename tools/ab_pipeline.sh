#!/bin/bash
# r4-vs-r5 within-session pipeline A/B (VERDICT r5 item #1).
# Generates ONE shared sf0.1-sized input store, then alternates full
# pipeline runs between the r4 worktree code and the current repo code
# so box drift hits both versions equally.  Results -> /tmp/tsf_ab/ab.jsonl
set -e
ROOT=/tmp/tsf_ab
STORE=$ROOT/store
R4=/root/repo/.worktrees/r4
R5=/root/repo
CORES=${CORES:-32}
ITERS=${ITERS:-4}
mkdir -p $ROOT
if [ ! -d "$STORE" ]; then
  PYTHONPATH=$R5 python - "$STORE" "$CORES" <<'EOF'
import sys
from tsforge_spark.fixtures import make_transcripts_distributed
from tsforge_spark.session import get_spark
from tsforge_spark.sources.snapshots import SnapshotStore
store, cores = sys.argv[1], int(sys.argv[2])
spark = get_spark("tsforge-ab-gen", master=f"local[{cores}]",
                  shuffle_partitions=max(cores, 8))
df = make_transcripts_distributed(spark, 20000, seed=42, mean_turns=60,
                                  parts=cores * 8)
SnapshotStore(store).append(df)
spark.stop()
EOF
fi
: > $ROOT/ab.jsonl
for i in $(seq 1 $ITERS); do
  for V in r4 r5; do
    DIR=$([ $V = r4 ] && echo $R4 || echo $R5)
    echo "== iter $i $V =="
    PYTHONPATH=$DIR python /root/repo/tools/ab_run_once.py \
          $STORE $ROOT/out_${V} $CORES 2>/dev/null | tail -1 >> $ROOT/ab.jsonl
    tail -1 $ROOT/ab.jsonl
  done
done
