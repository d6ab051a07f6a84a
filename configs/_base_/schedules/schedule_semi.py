# DSL semi schedule: SGD 0.01, warmup 500 iters, steps [20, 26], 28 epochs
optimizer = dict(type='SGD', lr=0.01, momentum=0.9, weight_decay=0.0001,
                 paramwise_cfg=dict(bias_lr_mult=2., bias_decay_mult=0.))
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
lr_config = dict(policy='step', warmup='linear', warmup_iters=500,
                 warmup_ratio=1.0 / 3, step=[20, 26])
runner = dict(type='SemiEpochBasedRunner', max_epochs=28)
