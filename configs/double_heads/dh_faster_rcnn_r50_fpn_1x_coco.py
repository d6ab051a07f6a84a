# Double-Head Faster R-CNN
# (reference configs/double_heads/dh_faster_rcnn_r50_fpn_1x_coco.py)
_base_ = ['../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py']
model = dict(
    type='DoubleHeadRCNN',
    bbox_head=dict(
        _delete_=True,
        type='DoubleConvFCBBoxHead',
        num_classes=80,
        in_channels=256,
        roi_size=7,
        num_convs=4,
        num_fcs=2,
        conv_out_channels=1024,
        fc_out_channels=1024,
        reg_roi_scale_factor=1.3))
