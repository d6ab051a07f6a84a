# 20e schedule: SGD 0.02, step [16, 19], 20 epochs (reference
# configs/_base_/schedules/schedule_20e.py).
optimizer = dict(type='SGD', lr=0.02, momentum=0.9, weight_decay=0.0001)
optimizer_config = dict(grad_clip=None)
lr_config = dict(policy='step', warmup='linear', warmup_iters=500,
                 warmup_ratio=0.001, step=[16, 19])
runner = dict(type='EpochBasedRunner', max_epochs=20)
