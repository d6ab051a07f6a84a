# RetinaNet + NAS-FPN with the separate-BN retina head (the reference's
# actual head for this config, configs/nas_fpn/retinanet_r50_nasfpn_crop640_50e_coco.py)
_base_ = ['./retinanet_r50_nasfpn_crop640_50e_coco.py']
model = dict(bbox_head=dict(type='RetinaSepBNHead', num_ins=5))
