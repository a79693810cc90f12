/**
 * XML (de)serialization proxies so the image-charge integrators
 * round-trip through openmm.XmlSerializer (parity:
 * /root/reference/lib/openmm-ic-plugin/serialization/).
 */

#include "ICDrudeLangevinIntegrator.h"
#include "ICLangevinIntegrator.h"
#include "openmm/serialization/SerializationNode.h"
#include "openmm/serialization/SerializationProxy.h"

#if defined(WIN32)
#include <windows.h>
extern "C" void registerICSerializationProxies();
BOOL WINAPI DllMain(HANDLE hModule, DWORD ul_reason_for_call,
                    LPVOID lpReserved) {
    if (ul_reason_for_call == DLL_PROCESS_ATTACH)
        registerICSerializationProxies();
    return TRUE;
}
#else
extern "C" void __attribute__((constructor))
registerICSerializationProxies();
#endif

using namespace ICPlugin;
using namespace OpenMM;

namespace ICPlugin {

class ICLangevinIntegratorProxy : public SerializationProxy {
 public:
    ICLangevinIntegratorProxy()
        : SerializationProxy("ICLangevinIntegrator") {}

    void serialize(const void* object,
                   SerializationNode& node) const override {
        node.setIntProperty("version", 1);
        const auto& integrator =
            *reinterpret_cast<const ICLangevinIntegrator*>(object);
        node.setDoubleProperty("temperature",
                               integrator.getTemperature());
        node.setDoubleProperty("friction", integrator.getFriction());
        node.setDoubleProperty("stepSize", integrator.getStepSize());
        node.setDoubleProperty("constraintTolerance",
                               integrator.getConstraintTolerance());
        node.setIntProperty("numCells", integrator.getNumCells());
        node.setDoubleProperty("cellZSize", integrator.getCellZSize());
        node.setIntProperty("randomSeed",
                            integrator.getRandomNumberSeed());
    }

    void* deserialize(const SerializationNode& node) const override {
        if (node.getIntProperty("version") != 1)
            throw OpenMMException("Unsupported version number");
        auto* integrator = new ICLangevinIntegrator(
            node.getDoubleProperty("temperature"),
            node.getDoubleProperty("friction"),
            node.getDoubleProperty("stepSize"),
            node.getIntProperty("numCells"),
            node.getDoubleProperty("cellZSize"));
        integrator->setConstraintTolerance(
            node.getDoubleProperty("constraintTolerance"));
        integrator->setRandomNumberSeed(
            node.getIntProperty("randomSeed"));
        return integrator;
    }
};

class ICDrudeLangevinIntegratorProxy : public SerializationProxy {
 public:
    ICDrudeLangevinIntegratorProxy()
        : SerializationProxy("ICDrudeLangevinIntegrator") {}

    void serialize(const void* object,
                   SerializationNode& node) const override {
        node.setIntProperty("version", 1);
        const auto& integrator =
            *reinterpret_cast<const ICDrudeLangevinIntegrator*>(object);
        node.setDoubleProperty("temperature",
                               integrator.getTemperature());
        node.setDoubleProperty("friction", integrator.getFriction());
        node.setDoubleProperty("drudeTemperature",
                               integrator.getDrudeTemperature());
        node.setDoubleProperty("drudeFriction",
                               integrator.getDrudeFriction());
        node.setDoubleProperty("maxDrudeDistance",
                               integrator.getMaxDrudeDistance());
        node.setDoubleProperty("stepSize", integrator.getStepSize());
        node.setDoubleProperty("constraintTolerance",
                               integrator.getConstraintTolerance());
        node.setIntProperty("numCells", integrator.getNumCells());
        node.setDoubleProperty("cellZSize", integrator.getCellZSize());
        node.setIntProperty("randomSeed",
                            integrator.getRandomNumberSeed());
    }

    void* deserialize(const SerializationNode& node) const override {
        if (node.getIntProperty("version") != 1)
            throw OpenMMException("Unsupported version number");
        auto* integrator = new ICDrudeLangevinIntegrator(
            node.getDoubleProperty("temperature"),
            node.getDoubleProperty("friction"),
            node.getDoubleProperty("drudeTemperature"),
            node.getDoubleProperty("drudeFriction"),
            node.getDoubleProperty("stepSize"),
            node.getIntProperty("numCells"),
            node.getDoubleProperty("cellZSize"));
        integrator->setMaxDrudeDistance(
            node.getDoubleProperty("maxDrudeDistance"));
        integrator->setConstraintTolerance(
            node.getDoubleProperty("constraintTolerance"));
        integrator->setRandomNumberSeed(
            node.getIntProperty("randomSeed"));
        return integrator;
    }
};

}  // namespace ICPlugin

extern "C" void registerICSerializationProxies() {
    SerializationProxy::registerProxy(
        typeid(ICLangevinIntegrator),
        new ICLangevinIntegratorProxy());
    SerializationProxy::registerProxy(
        typeid(ICDrudeLangevinIntegrator),
        new ICDrudeLangevinIntegratorProxy());
}
