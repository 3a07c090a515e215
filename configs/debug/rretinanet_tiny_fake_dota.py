# Debug config: 3-class RRetinaNet on a synthetic DOTA split (512 patches).
# Used by the end-to-end learning check (train -> eval mAP > 0).
_base_ = ['../rretinanet/rretinanet_obb_r50_fpn_1x_dota_v1.py']

angle_version = 'v1'
model = dict(
    bbox_head=dict(
        num_classes=3,
        stacked_convs=2,
        assign_by_circumhbbox=angle_version))

classes = ('plane', 'ship', 'small-vehicle')
data = dict(
    samples_per_gpu=4,
    train=dict(
        ann_file='/tmp/fake_dota_split/trainval/annfiles/',
        img_prefix='/tmp/fake_dota_split/trainval/images/',
        classes=classes),
    val=dict(
        ann_file='/tmp/fake_dota_split/trainval/annfiles/',
        img_prefix='/tmp/fake_dota_split/trainval/images/',
        classes=classes),
    # tools/test.py evaluates data.test (reference semantics); point it
    # at the annotated split so --eval mAP works for the dress rehearsal
    test=dict(
        ann_file='/tmp/fake_dota_split/trainval/annfiles/',
        img_prefix='/tmp/fake_dota_split/trainval/images/',
        classes=classes))
optimizer = dict(lr=1e-2)
lr_config = dict(warmup_iters=50)
# tiny dataset => epochs are ~3 steps; keep lr flat for the overfit check
lr_config = dict(warmup_iters=50, step=[10000])
