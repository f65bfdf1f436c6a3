#!/bin/sh
# VA (vision-audio) pre-training — the TPU-native equivalent of the
# reference's released script (`/root/reference/bash/run_bimodal_va.sh`).
#
#   bash bash/run_bimodal_va.sh bimodal
#
# Maps 1:1 onto the reference's knobs with the distributed-backend swap:
# CUDA_VISIBLE_DEVICES / port / num_gpus / mode=dp become one SPMD program
# over the jax.sharding mesh (mesh.data=-1 takes every visible chip; the
# contrastive loss sees the GLOBAL batch, which is what the reference's
# dp mode bought it on a single host). Multi-host: launch once per host
# with NUM_PROCESSES/PROCESS_ID/COORDINATOR set (train.py bootstraps
# jax.distributed).

run_type=${1:-bimodal}
[ $# -ge 1 ] && shift  # remaining args pass through as config overrides

# data/model roots — override from the environment for real runs
data_root=${DATA_ROOT:-/data/audioset}
data_name=${DATA_NAME:-src_unbalanced_train_segments}
eval_name=${EVAL_NAME:-src_balanced_train_segments}
clip_root=${CLIP_MODEL_ROOT:-/models/clip}
clip_name=${CLIP_MODEL_NAME:-ViT-B32}
model_name=${MODEL_NAME:-test}
batch_size=${BATCH_SIZE:-432}   # reference's released B (run_bimodal_va.sh)
num_proc=${NUM_PROC:-2}

mtask="
model_name=$model_name worker=CVAP monitor=VAMonitor num_proc=$num_proc eval=False verbose=True
+model/image=vit_val +model/audio=vit_val +model/text=dummy +model/loss=ce
+optimizer=standard +running/audio=default
model.audio.pre_encoder.in_channels=3 model.audio.pre_encoder.stride=[16,24]
optimizer.warmup=False running.audio.norms=[-4.93839311,5.75751113]
running.epochs=1 running.batch_size=$batch_size running.peep_rate=50
running.save_rate=100 running.eval_samples=100
running.data_root=$data_root running.data_name=$data_name
running.eval_name=$eval_name
running.clip_model_root=$clip_root running.clip_model_name=$clip_name
mesh.data=-1
"

python train.py +running=$run_type $mtask "$@"
