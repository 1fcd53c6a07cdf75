# Concerto large pretraining with video data (RE10K) added to the mix
# (parity: reference configs/concerto/pretrain-concerto-v1m1-2-large-video.py)
_base_ = ["./pretrain-concerto-v1m1-1-large-base.py"]

# extends the training mix with RE10K video scenes lifted to point clouds
extra_train_datasets = [
    dict(
        type="DefaultImagePointDataset",
        crop_h=518,
        crop_w=518,
        patch_size=14,
        split=["train", "test"],
        data_root="data/re10k",
        test_mode=False,
        loop=1,
    ),
]
