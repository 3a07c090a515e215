# HBB-assignment variant of the v3 model.
_base_ = ['./rretinanet_obb_r50_fpn_1x_dota_v3.py']

angle_version = 'v3'
model = dict(bbox_head=dict(assign_by_circumhbbox=angle_version))
