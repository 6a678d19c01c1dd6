#!/bin/bash
# Full-suite demonstration in bounded chunks (VERDICT r4 #6): the whole
# suite cannot finish inside one sitting on this 1-vCPU host, so it is
# split into chunks each expected <15 min; every chunk writes its own
# green log to out/r5_pytest_chunk<N>.log. Run single chunks with
#   bash tools/run_suite_chunks.sh 3
# or everything with no argument.
set -u
cd "$(dirname "$0")/.."
declare -a CHUNKS=(
  "tests/test_rans.py tests/test_entropy.py tests/test_async_coder.py tests/test_utils.py tests/test_vision.py tests/test_datasets.py tests/test_warp_impls.py tests/test_sharding.py tests/test_distributed.py tests/test_dtype_consistency.py"
  "tests/test_evc.py tests/test_evc_scalable.py tests/test_intra_dc.py"
  "tests/test_hem.py tests/test_tcm.py tests/test_dcvc_gen1.py"
  "tests/test_video_dc.py tests/test_canf.py tests/test_intra_zoo.py"
  "tests/test_golden_bins.py tests/test_block_warp.py"
  "tests/test_runner.py tests/test_cli.py tests/test_serving.py"
  "tests/test_training.py tests/test_training_more.py tests/test_train_fidelity.py"
  "tests/test_sharding_coding.py tests/test_sharding_dmc.py"
  "tests/test_torch_parity.py"
  "tests/test_full_model_parity.py tests/test_trained_parity_proxy.py"
)
SEL=${1:-all}
rc_all=0
for i in "${!CHUNKS[@]}"; do
    n=$((i + 1))
    if [ "$SEL" != "all" ] && [ "$SEL" != "$n" ]; then continue; fi
    LOG=out/r5_pytest_chunk$n.log
    echo "=== chunk $n start $(date -u +%H:%M:%S): ${CHUNKS[$i]} ===" > "$LOG"
    timeout 2400 python -m pytest ${CHUNKS[$i]} -q >> "$LOG" 2>&1
    rc=$?
    echo "=== chunk $n rc=$rc $(date -u +%H:%M:%S) ===" >> "$LOG"
    [ $rc -ne 0 ] && rc_all=$rc
    tail -3 "$LOG"
done
exit $rc_all
