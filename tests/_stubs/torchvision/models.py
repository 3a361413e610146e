import torch_mbnetv2
import torch_resnet


def resnet18(*a, **k):
    return torch_resnet.resnet(layers=(2, 2, 2, 2), block="basic")


def mobilenet_v2(*a, **k):
    return torch_mbnetv2.mobilenet_v2()


def resnet50(*a, **k):
    return torch_resnet.resnet(layers=(3, 4, 6, 3))


def resnet101(*a, **k):
    return torch_resnet.resnet(layers=(3, 4, 23, 3))
