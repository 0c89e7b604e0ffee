#!/bin/bash
# Download the CMU Panoptic validation sequences + HD views needed for the
# CMU0 5-view evaluation split (equivalent of the reference's
# scripts/getData_val_CMU0.sh, itself derived from the public
# panoptic-toolbox getData.sh).
#
# Usage: ./scripts/get_panoptic_cmu0.sh <data_root> [--snu-endpoint]
#
# CMU0 camera arrangement = HD views (0,3) (0,6) (0,12) (0,13) (0,23)
# (lib/dataset/panoptic.py:207-215); validation sequences per
# TRAIN/VAL_LISTS (panoptic.py:54-172).

set -euo pipefail

root=${1:-./data/panoptic-toolbox}
endpoint="http://domedb.perception.cs.cmu.edu"
if [[ "${2:-}" == "--snu-endpoint" ]]; then
  endpoint="http://vcl.snu.ac.kr/panoptic"
fi

val_seqs=(160906_pizza1 160422_haggling1 160906_ian5 160906_band4)
hd_views=(3 6 12 13 23)

mkdir -p "$root"
cd "$root"

for seq in "${val_seqs[@]}"; do
  mkdir -p "$seq/hdVideos"
  # 3D pose annotations: gate on the EXTRACTED dir, not the tar — a
  # partial tar from an interrupted run must resume (wget -c), and
  # extraction must rerun until it succeeds
  if [ ! -d "$seq/hdPose3d_stage1_coco19" ]; then
    # -P (not -O): wget -c only resumes reliably onto the server-named
    # file
    wget -c -P "$seq" \
        "$endpoint/webdata/dataset/$seq/hdPose3d_stage1_coco19.tar"
    tar -xf "$seq/hdPose3d_stage1_coco19.tar" -C "$seq"
  fi
  # calibration
  wget -c "$endpoint/webdata/dataset/$seq/calibration_${seq}.json" \
      -O "$seq/calibration_${seq}.json"
  # the 5 CMU0 HD videos
  for v in "${hd_views[@]}"; do
    pad=$(printf "%02d" "$v")
    f="$seq/hdVideos/hd_00_${pad}.mp4"
    [ -f "$f" ] || { wget -c -P "$seq/hdVideos" \
        "$endpoint/webdata/dataset/$seq/videos/hd_shared_crf20/hd_00_${pad}.mp4"; }
  done
done

echo "done. extract frames with the panoptic-toolbox hdVideoToImgs script"
echo "into <seq>/hdImgs/00_<cam>/ before running validation."
