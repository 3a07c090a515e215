# Debug config: 3-class R3Det (1 refine stage) on the synthetic DOTA split.
_base_ = ['../r3det/r3det_tiny_r50_fpn_1x_dota_v1.py']

angle_version = 'v1'
model = dict(
    bbox_head=dict(num_classes=3),
    refine_heads=[dict(num_classes=3, stacked_convs=2)])

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
    # tools/test.py evaluates data.test (reference semantics,
    # /root/reference/tools/test.py:108-236); point it at the
    # annotated split so --eval mAP works for the dress rehearsal
    test=dict(
        ann_file='/tmp/fake_dota_split/trainval/annfiles/',
        img_prefix='/tmp/fake_dota_split/trainval/images/',
        classes=classes))
optimizer = dict(lr=1e-2)
lr_config = dict(warmup_iters=50, step=[10000])
checkpoint_config = dict(interval=100)
