# 3x schedule: 36 epochs, step decay at epochs 24 and 33.
# Parity: /root/reference/configs/_base_/schedules/schedule_3x.py
evaluation = dict(interval=36, metric='mAP')
optimizer = dict(type='SGD', lr=2.5e-3, momentum=0.9, weight_decay=1e-4)
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
lr_config = dict(
    policy='step',
    warmup='linear',
    warmup_iters=500,
    warmup_ratio=1.0 / 3,
    step=[24, 33])
runner = dict(type='EpochBasedRunner', max_epochs=36)
checkpoint_config = dict(interval=12)
