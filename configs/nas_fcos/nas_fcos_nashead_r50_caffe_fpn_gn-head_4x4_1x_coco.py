# NAS-FCOS (reference configs/nas_fcos/nas_fcos_nashead_r50_caffe_fpn_gn-head_4x4_1x_coco.py)
_base_ = ['../fcos_semi/r50_caffe_mslonger_tricks_0.Xdata.py']
model = dict(
    type='FCOS',
    neck=dict(_delete_=True, type='NASFCOS_FPN',
              in_channels=[512, 1024, 2048], out_channels=256, num_outs=5),
    bbox_head=dict(type='NASFCOSHead'))
