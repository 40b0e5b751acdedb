/*
 * nrdtpu C ABI - native entry points for the TPU denoising engine.
 *
 * Mirrors the role of the reference's public C ABI (Include/NRD.h:51-66: CreateInstance /
 * GetInstanceDesc / SetCommonSettings / SetDenoiserSettings / GetComputeDispatches /
 * DestroyInstance) re-shaped for an engine that executes, rather than describes, the work:
 * there are no dispatch descriptors to return, so Denoise() runs the frame and fills the
 * caller's output planes directly.
 *
 * All images are row-major float32 planes of rect_height x rect_width x channels, pixel
 * (x, y) at [y * width + x]. Matrices are column-major 16-float arrays, vector-is-a-column
 * (same contract as NRDSettings.h:90-114).
 */

#ifndef NRDTPU_C_H
#define NRDTPU_C_H

#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

#define NRDTPU_VERSION_MAJOR 0
#define NRDTPU_VERSION_MINOR 1

typedef struct nrdtpu_instance nrdtpu_instance;

typedef enum nrdtpu_result {
    NRDTPU_SUCCESS = 0,
    NRDTPU_FAILURE = 1,
    NRDTPU_INVALID_ARGUMENT = 2,
    NRDTPU_UNSUPPORTED = 3,
} nrdtpu_result;

/* Matches nrdtpu.settings.Denoiser (== reference Denoiser enum order). */
typedef enum nrdtpu_denoiser {
    NRDTPU_REBLUR_DIFFUSE = 0,
    NRDTPU_REBLUR_DIFFUSE_OCCLUSION = 1,
    NRDTPU_REBLUR_DIFFUSE_SH = 2,
    NRDTPU_REBLUR_SPECULAR = 3,
    NRDTPU_REBLUR_SPECULAR_OCCLUSION = 4,
    NRDTPU_REBLUR_SPECULAR_SH = 5,
    NRDTPU_REBLUR_DIFFUSE_SPECULAR = 6,
    NRDTPU_REBLUR_DIFFUSE_SPECULAR_OCCLUSION = 7,
    NRDTPU_REBLUR_DIFFUSE_SPECULAR_SH = 8,
    NRDTPU_REBLUR_DIFFUSE_DIRECTIONAL_OCCLUSION = 9,
    NRDTPU_RELAX_DIFFUSE = 10,
    NRDTPU_RELAX_DIFFUSE_SH = 11,
    NRDTPU_RELAX_SPECULAR = 12,
    NRDTPU_RELAX_SPECULAR_SH = 13,
    NRDTPU_RELAX_DIFFUSE_SPECULAR = 14,
    NRDTPU_RELAX_DIFFUSE_SPECULAR_SH = 15,
    NRDTPU_SIGMA_SHADOW = 16,
    NRDTPU_SIGMA_SHADOW_TRANSLUCENCY = 17,
    NRDTPU_REFERENCE = 18,
} nrdtpu_denoiser;

/* Matches nrdtpu.settings.ResourceType (== reference ResourceType enum order). */
typedef enum nrdtpu_resource {
    NRDTPU_IN_MV = 0,
    NRDTPU_IN_NORMAL_ROUGHNESS = 1,
    NRDTPU_IN_VIEWZ = 2,
    NRDTPU_IN_DIFF_CONFIDENCE = 3,
    NRDTPU_IN_SPEC_CONFIDENCE = 4,
    NRDTPU_IN_DISOCCLUSION_THRESHOLD_MIX = 5,
    NRDTPU_IN_BASECOLOR_METALNESS = 6,
    NRDTPU_IN_DIFF_RADIANCE_HITDIST = 7,
    NRDTPU_IN_SPEC_RADIANCE_HITDIST = 8,
    NRDTPU_IN_DIFF_HITDIST = 9,
    NRDTPU_IN_SPEC_HITDIST = 10,
    NRDTPU_IN_DIFF_DIRECTION_HITDIST = 11,
    NRDTPU_IN_DIFF_SH0 = 12,
    NRDTPU_IN_DIFF_SH1 = 13,
    NRDTPU_IN_SPEC_SH0 = 14,
    NRDTPU_IN_SPEC_SH1 = 15,
    NRDTPU_IN_PENUMBRA = 16,
    NRDTPU_IN_TRANSLUCENCY = 17,
    NRDTPU_IN_SIGNAL = 18,
    NRDTPU_OUT_DIFF_RADIANCE_HITDIST = 19,
    NRDTPU_OUT_SPEC_RADIANCE_HITDIST = 20,
    NRDTPU_OUT_DIFF_SH0 = 21,
    NRDTPU_OUT_DIFF_SH1 = 22,
    NRDTPU_OUT_SPEC_SH0 = 23,
    NRDTPU_OUT_SPEC_SH1 = 24,
    NRDTPU_OUT_DIFF_HITDIST = 25,
    NRDTPU_OUT_SPEC_HITDIST = 26,
    NRDTPU_OUT_DIFF_DIRECTION_HITDIST = 27,
    NRDTPU_OUT_SHADOW_TRANSLUCENCY = 28,
    NRDTPU_OUT_SIGNAL = 29,
    NRDTPU_OUT_VALIDATION = 30,
    NRDTPU_RESOURCE_MAX_NUM = 31,
} nrdtpu_resource;

/* Flattened CommonSettings (NRDSettings.h:88-195 contract). */
typedef struct nrdtpu_common_settings {
    float view_to_clip_matrix[16];
    float view_to_clip_matrix_prev[16];
    float world_to_view_matrix[16];
    float world_to_view_matrix_prev[16];
    float world_prev_to_world_matrix[16];
    float motion_vector_scale[3];
    float camera_jitter[2];
    float camera_jitter_prev[2];
    uint16_t resource_size[2];
    uint16_t resource_size_prev[2];
    uint16_t rect_size[2];
    uint16_t rect_size_prev[2];
    float view_z_scale;
    float time_delta_between_frames;
    float denoising_range;
    float disocclusion_threshold;
    float disocclusion_threshold_alternate;
    float camera_attached_reflection_material_id;
    float strand_material_id;
    float strand_thickness;
    float split_screen;
    float debug;
    uint32_t rect_origin[2];
    uint32_t frame_index;
    uint8_t accumulation_mode; /* 0 CONTINUE, 1 RESTART, 2 CLEAR_AND_RESTART */
    uint8_t is_motion_vector_in_world_space;
    uint8_t is_history_confidence_available;
    uint8_t is_disocclusion_threshold_mix_available;
    uint8_t is_base_color_metalness_available;
    uint8_t enable_validation;
} nrdtpu_common_settings;

typedef struct nrdtpu_denoiser_desc {
    uint32_t identifier;
    nrdtpu_denoiser denoiser;
} nrdtpu_denoiser_desc;

/* One user-pool slot: caller-owned float32 plane. channels in {1, 2, 3, 4}.
 * For inputs, data is read at Denoise(); for outputs, data is written. */
typedef struct nrdtpu_resource_slot {
    nrdtpu_resource type;
    float* data;
    uint32_t channels;
} nrdtpu_resource_slot;

/* Library info (GetLibraryDesc analogue). */
const char* nrdtpu_get_version_string(void);

/* CreateInstance analogue. normal_encoding / roughness_encoding match the
 * NormalEncoding / RoughnessEncoding enums (NRDDescs.h:340-370). */
nrdtpu_result nrdtpu_create_instance(const nrdtpu_denoiser_desc* denoisers,
                                     uint32_t denoiser_num,
                                     uint16_t resource_w, uint16_t resource_h,
                                     uint32_t normal_encoding,
                                     uint32_t roughness_encoding,
                                     nrdtpu_instance** out_instance);

nrdtpu_result nrdtpu_set_common_settings(nrdtpu_instance* instance,
                                         const nrdtpu_common_settings* settings);

/* SetDenoiserSettings analogue: settings passed as "key=value;..." text to stay
 * ABI-stable across settings-struct evolution (numeric fields of the python dataclasses). */
nrdtpu_result nrdtpu_set_denoiser_settings(nrdtpu_instance* instance, uint32_t identifier,
                                           const char* settings_kv);

/* Run the denoisers for this frame. Inputs and outputs are given as resource slots. */
nrdtpu_result nrdtpu_denoise(nrdtpu_instance* instance,
                             const uint32_t* identifiers, uint32_t identifier_num,
                             const nrdtpu_resource_slot* slots, uint32_t slot_num);

nrdtpu_result nrdtpu_destroy_instance(nrdtpu_instance* instance);

/* Last error message for a failed call (thread-local). */
const char* nrdtpu_get_last_error(void);

#ifdef __cplusplus
}
#endif

#endif /* NRDTPU_C_H */
