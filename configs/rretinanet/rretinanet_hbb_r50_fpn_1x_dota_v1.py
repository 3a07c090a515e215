# HBB-assignment variant: ground truth is replaced by its circumscribed
# horizontal box during assignment (everything else matches the OBB v1).
_base_ = ['./rretinanet_obb_r50_fpn_1x_dota_v1.py']

angle_version = 'v1'
model = dict(bbox_head=dict(assign_by_circumhbbox=angle_version))
