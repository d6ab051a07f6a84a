# CenterNet ResNet-18 + DCNv2 neck
# (reference configs/centernet/centernet_resnet18_dcnv2_140e_coco.py)
_base_ = ['../retinanet/retinanet_r50_fpn_1x_coco.py']
model = dict(
    _delete_=True,
    type='CenterNet',
    backbone=dict(type='ResNet', depth=18, out_indices=(3,)),
    neck=dict(type='CTResNetNeck', in_channel=512,
              num_deconv_filters=(256, 128, 64),
              num_deconv_kernels=(4, 4, 4), use_dcn=True),
    bbox_head=dict(type='CenterNetHead', num_classes=80, in_channels=64,
                   feat_channels=64),
    test_cfg=dict(topk=100, local_maximum_kernel=3, score_thr=0.05,
                  max_per_img=100))
