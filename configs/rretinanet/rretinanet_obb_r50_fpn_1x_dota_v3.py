# Rotated RetinaNet, OBB anchors, angle convention v3 (OBBDetection style).
_base_ = ['./rretinanet_obb_r50_fpn_1x_dota_v1.py']

angle_version = 'v3'

model = dict(
    bbox_head=dict(
        bbox_coder=dict(angle_range=angle_version),
        ),
    train_cfg=dict(
        assigner=dict(iou_calculator=dict(type='RBboxOverlaps2D_v3'))),
    test_cfg=dict(nms=dict(type='v3', iou_thr=0.1)))

data = dict(
    train=dict(version=angle_version),
    val=dict(version=angle_version),
    test=dict(version=angle_version))
