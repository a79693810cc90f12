#ifndef OPENMM_WINDOWS_EXPORT_IC_H_
#define OPENMM_WINDOWS_EXPORT_IC_H_

#if defined(_WIN32) && !defined(IC_PLUGIN_STATIC)
#if defined(IC_PLUGIN_BUILDING_SHARED_LIBRARY)
#define OPENMM_EXPORT_IC __declspec(dllexport)
#else
#define OPENMM_EXPORT_IC __declspec(dllimport)
#endif
#else
#define OPENMM_EXPORT_IC
#endif

#endif  // OPENMM_WINDOWS_EXPORT_IC_H_
