# R3Det* ("tiny"): 2 stacked convs per head branch (base + refine).
# Reference counterpart reproduces 70.86 box AP. Note: list-valued keys
# replace rather than merge, so the refine head is restated in full.
_base_ = ['./r3det_r50_fpn_1x_dota_v1.py']

angle_version = 'v1'

model = dict(
    bbox_head=dict(stacked_convs=2),
    refine_heads=[
        dict(
            type='RRetinaRefineHead',
            num_classes=15,
            in_channels=256,
            stacked_convs=2,
            feat_channels=256,
            assign_by_circumhbbox=None,
            anchor_generator=dict(
                type='PseudoAnchorGenerator', strides=[8, 16, 32, 64, 128]),
            bbox_coder=dict(
                type='DeltaXYWHAOBBoxCoder',
                angle_range=angle_version,
                target_means=(0., 0., 0., 0., 0.),
                target_stds=(1., 1., 1., 1., 1.)),
            loss_cls=dict(
                type='FocalLoss', use_sigmoid=True, gamma=2.0, alpha=0.25,
                loss_weight=1.0),
            loss_bbox=dict(type='SmoothL1Loss', beta=0.11, loss_weight=1.0)),
    ])
