import torch_resnet


def resnet18(*a, **k):
    raise NotImplementedError("stub: Bottleneck nets only")


def resnet50(*a, **k):
    return torch_resnet.resnet(layers=(3, 4, 6, 3))


def resnet101(*a, **k):
    return torch_resnet.resnet(layers=(3, 4, 23, 3))
