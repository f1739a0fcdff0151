# internal package of the protobuf runtime shim
